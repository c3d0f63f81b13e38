"""Golden-image regression tests (SURVEY.md section 4 test plan).

Rather than storing full frames, each config stores an 8x8 block-mean
thumbnail of the rendered image — robust to sub-ulp numeric drift across
backends, sensitive to any real change in geometry, shading, shadows or
compositing.  Regenerate with REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
after an intentional change, and review the printed diffs.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("REGEN_GOLDEN") == "1"


def _thumb(img, h, w, k=8):
    a = np.asarray(img, dtype=np.float64).reshape(h, w, 3)
    bh, bw = h // k, w // k
    return a[: bh * k, : bw * k].reshape(k, bh, k, bw, 3).mean(axis=(1, 3))


def _check(name, thumb, atol=2e-2):
    path = os.path.join(GOLDEN_DIR, name + ".npy")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, thumb)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    ref = np.load(path)
    np.testing.assert_allclose(thumb, ref, atol=atol,
                               err_msg=f"golden mismatch: {name}")


@pytest.fixture(scope="module")
def scene():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.world.world import World

    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=7,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    return w, jax.tree_util.tree_map(jnp.asarray, dev)


def _render(dev, shadow):
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render

    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    out = render(dev, jnp.asarray(o), jnp.asarray(d),
                 jnp.asarray(cam.position, dtype=jnp.float32),
                 cfg=RenderConfig(shadow=shadow))
    return out["rgb"], cam.height, cam.width


def test_golden_plain(scene):
    _, dev = scene
    rgb, h, w = _render(dev, "none")
    _check("plain_2x1x2_d5", _thumb(rgb, h, w))


def test_golden_ray_shadow(scene):
    _, dev = scene
    rgb, h, w = _render(dev, "ray")
    _check("rayshadow_2x1x2_d5", _thumb(rgb, h, w))


def test_golden_map_shadow(scene):
    """shadow="map" — the projective shadow-map path (reference shadow pass,
    ShadowmapWorld.Fragment.glsl:15-19 → computeShadow) whose depth metric
    and texel-scaled bias were redesigned in round 3; this golden fails if
    either regresses (VERDICT r3 #7)."""
    _, dev = scene
    rgb, h, w = _render(dev, "map")
    _check("mapshadow_2x1x2_d5", _thumb(rgb, h, w))


def test_golden_after_edit(scene):
    import copy

    import jax
    import jax.numpy as jnp

    w, _ = scene
    w = copy.deepcopy(w)
    wa, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    dev = w.apply(wa, dev, w.replace((10, 8, 10), (54, 22, 54), 5))
    rgb, h, wd = _render(dev, "none")
    _check("edited_2x1x2_d5", _thumb(rgb, h, wd))


def test_golden_soft_composite(scene):
    """The differentiable soft renderer's output is also pinned."""
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.diff import (
        init_params_from_world,
        render_soft,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), pitch_deg=-20.0,
                            fov_deg=70.0, width=48, height=27)
    o, d = cam.rays()
    params = init_params_from_world(dev)
    out = render_soft(dev, params, jnp.asarray(o), jnp.asarray(d))
    _check("soft_2x1x2_d5", _thumb(out["rgb"], 27, 48, k=3), atol=3e-2)


def test_golden_render_frame_path(scene):
    """The host-tiled render_frame path (what bench.py times) reproduces
    the same golden as render()."""
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render_frame

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    out = render_frame(dev, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(cam.position, dtype=jnp.float32),
                       cfg=RenderConfig(shadow="none"), tile=1000)
    _check("plain_2x1x2_d5", _thumb(out["rgb"], 54, 96))


def test_golden_render_frame_fused(scene):
    """The one-executable fused frame path reproduces the same golden as
    the per-tile-dispatch path (same internal tiling, one launch)."""
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render_frame

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    out = render_frame(dev, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(cam.position, dtype=jnp.float32),
                       cfg=RenderConfig(shadow="none"), tile=1000, fused=True)
    _check("plain_2x1x2_d5", _thumb(out["rgb"], 54, 96))
    # and with the shadow-map pass (its own executable feeding the fused one)
    out = render_frame(dev, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(cam.position, dtype=jnp.float32),
                       cfg=RenderConfig(shadow="map"), tile=1000, fused=True)
    _check("mapshadow_2x1x2_d5", _thumb(out["rgb"], 54, 96))


def test_golden_render_frame_compact(scene):
    """The stage-compacted frame path (render_frame(compact=True) —
    VERDICT r4 #1) reproduces the SAME goldens as render() for every
    shadow mode: the compact march is bit-identical, so the shaded frame
    must be too."""
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render_frame

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    lanes = {}
    for shadow, golden in (("none", "plain_2x1x2_d5"),
                           ("ray", "rayshadow_2x1x2_d5"),
                           ("map", "mapshadow_2x1x2_d5")):
        out = render_frame(dev, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(cam.position, dtype=jnp.float32),
                           cfg=RenderConfig(shadow=shadow), tile=1024,
                           compact=True)
        lanes[shadow] = int(out["lane_iters"])
        assert lanes[shadow] > 0
        _check(golden, _thumb(out["rgb"], 54, 96))
    # the compact path compacts EVERY march of the frame, and lane_iters is
    # the WHOLE frame's cost: both shadow modes march more than camera-only
    # (map = the compact 512^2 light-depth bundle, ray = per-hit rays)
    assert lanes["map"] > lanes["none"]
    assert lanes["ray"] > lanes["none"]


def test_compact_frame_rgb_matches_plain_per_pixel(scene):
    """Stronger than the thumbnail golden: the compact frame matches the
    plain render() pixel for pixel.  The MARCH outputs (hit) are
    bit-identical; rgb/depth run the same shade formulas but inside one
    fused executable, where XLA contracts mul+add chains into fmas that
    the eager path rounds separately — so those compare at ulp tolerance
    (same effect measured in the sampler, diff/segments.py _extract_jit)."""
    import numpy as np

    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render, render_frame

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=64, height=36)
    o, d = cam.rays()
    eye = jnp.asarray(cam.position, dtype=jnp.float32)
    cfg = RenderConfig(shadow="ray")
    ref = render(dev, jnp.asarray(o), jnp.asarray(d), eye, cfg=cfg)
    got = render_frame(dev, jnp.asarray(o), jnp.asarray(d), eye, cfg=cfg,
                       tile=512, compact=True)
    np.testing.assert_array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-5, atol=1e-6)


def test_compact_shadowmap_matches_plain(scene):
    """render_shadowmap(compact=True): same depth map as the fused bundle
    pass — the march is bit-identical, the resolve at fma-ulp — plus a
    positive executed-lane count, and the map-shadow golden holds when the
    screen pass projects against the compact map."""
    import numpy as np

    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.lights import LightRig
    from octree_raymarcher_tpu.shade.render import (
        RenderConfig,
        render,
        render_shadowmap,
    )

    _, dev = scene
    rig = LightRig.default()
    d0, vp0 = render_shadowmap(dev, rig, resolution=(64, 64), max_steps=256)
    d1, vp1, executed = render_shadowmap(dev, rig, resolution=(64, 64),
                                         max_steps=256, compact=True,
                                         compact_tile=512)
    assert int(executed) > 0
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp1), np.asarray(vp0),
                               rtol=0, atol=0)

    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    dmap, vp, _ = render_shadowmap(dev, rig, compact=True)
    out = render(dev, jnp.asarray(o), jnp.asarray(d),
                 jnp.asarray(cam.position, dtype=jnp.float32),
                 cfg=RenderConfig(shadow="map"), shadowmap=(dmap, vp))
    _check("mapshadow_2x1x2_d5", _thumb(out["rgb"], 54, 96))


def test_golden_textured_envmap(scene):
    """Textured (procedural atlas) + environment-map render is pinned —
    the reference's PNG-atlas + skybox frame (Atlas.cpp:29, Skybox.cpp:84)."""
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade import default_atlas
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.envmap import default_envmap
    from octree_raymarcher_tpu.shade.render import RenderConfig, render

    _, dev = scene
    cam = PerspectiveCamera(position=(32.0, 30.0, -20.0), yaw_deg=0.0,
                            pitch_deg=-20.0, fov_deg=70.0, width=96, height=54)
    o, d = cam.rays()
    atlas = jnp.asarray(default_atlas(resolution=16, seed=0))
    env = jnp.asarray(default_envmap(32, 64))
    out = render(dev, jnp.asarray(o), jnp.asarray(d),
                 jnp.asarray(cam.position, dtype=jnp.float32),
                 cfg=RenderConfig(shadow="none"), atlas=atlas, envmap=env)
    _check("textured_env_2x1x2_d5", _thumb(out["rgb"], 54, 96))
