"""End-to-end forward render tests: world -> rays -> march -> shade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_raymarcher_tpu.shade import (
    LightRig,
    MaterialTable,
    OrthoCamera,
    PerspectiveCamera,
    RenderConfig,
    render,
    render_shadowmap,
)
from octree_raymarcher_tpu.world import single_chunk_world
from octree_raymarcher_tpu.worldgen import BoundsPyramid, grow


@pytest.fixture(scope="module")
def dworld():
    pyr = BoundsPyramid.generate(
        size=64, amplitude=16.0, period=1.0 / 64, xshift=0.0, yshift=24.0,
        zshift=0.0, seed=5,
    )
    chunk = grow([0.0, 0.0, 0.0], 64.0, depth=6, pyr=pyr)
    return single_chunk_world(chunk)


@pytest.fixture(scope="module")
def cam_rays():
    cam = PerspectiveCamera(
        position=(32.0, 45.0, -20.0), pitch_deg=-30.0, fov_deg=70.0,
        width=48, height=32,
    )
    return cam.rays(), cam.position


def test_render_basic(dworld, cam_rays):
    (origins, dirs), eye = cam_rays
    out = render(dworld, origins, dirs, eye)
    rgb = np.asarray(out["rgb"])
    assert rgb.shape == (48 * 32, 3)
    assert np.isfinite(rgb).all()
    hit = np.asarray(out["hit"])
    assert hit.any() and not hit.all()  # terrain visible + sky visible
    # sky pixels are the sky color
    sky = np.asarray(RenderConfig().sky, dtype=np.float32)
    np.testing.assert_allclose(rgb[~hit], np.tile(sky, (int((~hit).sum()), 1)), atol=1e-6)
    # hit pixels vary (lighting + materials)
    assert rgb[hit].std() > 0.01
    depth = np.asarray(out["depth"])
    assert (depth[~hit] == 1.0).all()
    assert (depth[hit] < 1.0).all()


def test_render_jit_and_grad_wrt_lights(dworld, cam_rays):
    (origins, dirs), eye = cam_rays
    lights = LightRig.default()
    mats = MaterialTable.default()

    @jax.jit
    def loss_fn(lights, mats):
        out = render(dworld, origins, dirs, eye, lights, mats)
        return jnp.mean(out["rgb"] ** 2)

    val = loss_fn(lights, mats)
    assert np.isfinite(float(val))
    g = jax.grad(lambda lt: loss_fn(lt, mats))(lights)
    # gradient flows to light parameters
    gd = np.asarray(g.directional.diffuse)
    assert np.isfinite(gd).all() and np.abs(gd).sum() > 0
    gm = jax.grad(lambda m: loss_fn(lights, m))(mats)
    assert np.abs(np.asarray(gm.diffuse)).sum() > 0


def test_ray_shadow_darkens(dworld, cam_rays):
    (origins, dirs), eye = cam_rays
    out_ns = render(dworld, origins, dirs, eye, cfg=RenderConfig(shadow="none"))
    out_rs = render(dworld, origins, dirs, eye, cfg=RenderConfig(shadow="ray"))
    hit = np.asarray(out_ns["hit"])
    lum_ns = np.asarray(out_ns["rgb"])[hit].mean()
    lum_rs = np.asarray(out_rs["rgb"])[hit].mean()
    assert lum_rs <= lum_ns + 1e-6


def test_map_shadow_runs(dworld, cam_rays):
    (origins, dirs), eye = cam_rays
    sm = render_shadowmap(dworld, LightRig.default(), resolution=(128, 128))
    depth = np.asarray(sm[0])
    assert depth.shape == (128, 128)
    assert (depth < 1.0).any()  # the light sees the terrain
    out = render(
        dworld, origins, dirs, eye, cfg=RenderConfig(shadow="map"), shadowmap=sm
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_shadowmap_assume_resident_bit_equal(dworld):
    """The static-world fast path (skip per-step chunk-residency gathers)
    must produce the bit-identical light-depth map on a resident world —
    same guarantee test_march_tiled pins for the camera march, here for
    the frame's OTHER march (render()/render_frame() forward
    cfg.assume_resident to the shadow pass)."""
    rig = LightRig.default()
    d0, vp0 = render_shadowmap(dworld, rig, resolution=(64, 64),
                               max_steps=256)
    d1, vp1 = render_shadowmap(dworld, rig, resolution=(64, 64),
                               max_steps=256, assume_resident=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(vp0), np.asarray(vp1))


def test_map_shadow_matches_ray_shadow(dworld, cam_rays):
    """The projective shadow map must agree with the exact ray-marched
    shadow on most hit pixels (IoU), not merely run.  Guards the two bugs
    that let map shadows silently degenerate to zero or to acne: a depth
    metric that is non-monotonic along the light rays (distance to the rig
    position with an inconsistent position/direction pair) and a bias in
    the wrong space (reference computeShadow compares raw codes with zero
    bias, World.Fragment.glsl:142-155)."""
    (origins, dirs), eye = cam_rays
    from octree_raymarcher_tpu.shade.render import map_shadow, ray_shadow
    from octree_raymarcher_tpu.core.geometry import cube_normal
    from octree_raymarcher_tpu.core.constants import EPS
    from octree_raymarcher_tpu.ops.march_jnp import march

    lights = LightRig.default()
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    res = march(dworld, o, d, 512)
    t_hit = jnp.where(res.hit, res.t, jnp.float32(0.0))
    p = o + d * (t_hit - jnp.float32(EPS))[:, None]
    n = cube_normal(p, res.cell_bmin, res.cell_bmin + res.cell_size[:, None])
    sf_ray = np.asarray(ray_shadow(dworld, res, p, n, lights, RenderConfig())) > 0.5

    depth, vp = render_shadowmap(dworld, lights, resolution=(512, 512))
    sf_map = np.asarray(map_shadow(p, depth, vp)) > 0.5
    hit = np.asarray(res.hit)
    sf_map &= hit

    assert sf_ray.any(), "scene must actually contain ray shadows"
    assert sf_map.any(), "map shadows must trigger at all"
    inter = (sf_map & sf_ray).sum()
    union = (sf_map | sf_ray).sum()
    assert inter / union > 0.5, (
        f"map vs ray shadow IoU {inter/union:.3f} "
        f"(map={sf_map[hit].mean():.3f} ray={sf_ray[hit].mean():.3f})")


def test_atlas_textures(dworld, cam_rays):
    (origins, dirs), eye = cam_rays
    rngk = np.random.default_rng(0)
    atlas = jnp.asarray(rngk.uniform(0.2, 1.0, size=(8, 8, 8, 3)).astype(np.float32))
    out_plain = render(dworld, origins, dirs, eye)
    out_tex = render(dworld, origins, dirs, eye, atlas=atlas)
    hit = np.asarray(out_plain["hit"])
    # textured render differs from flat-color render on hit pixels
    diff = np.abs(np.asarray(out_tex["rgb"]) - np.asarray(out_plain["rgb"]))[hit]
    assert diff.mean() > 1e-4


def test_ortho_camera_render(dworld):
    cam = OrthoCamera(
        position=(32.0, 80.0, 32.0), direction=(0, -1, 0), up=(0, 0, 1),
        width=63.0, height=63.0, xres=32, yres=32,
    )
    origins, dirs = cam.rays()
    out = render(dworld, origins, dirs, cam.position)
    assert np.asarray(out["hit"]).mean() > 0.9  # top-down view sees terrain


def test_render_frame_matches_render(dworld, cam_rays):
    """render_frame (the exact path bench.py times) must equal render()
    AOV-for-AOV, including the padding edge (ray count not a multiple of
    the host tile) and the shadow-map precompute."""
    from octree_raymarcher_tpu.shade import render_frame

    (origins, dirs), eye = cam_rays
    n = origins.shape[0]
    assert n % 7 != 0  # make sure the chosen tile really exercises padding

    for shadow in ("none", "map"):
        cfg = RenderConfig(shadow=shadow)
        ref = render(dworld, origins, dirs, eye, cfg=cfg)
        # tile=700 does not divide 1536 -> padded last tile
        out = render_frame(dworld, origins, dirs, eye, cfg=cfg, tile=700)
        assert set(out.keys()) == set(ref.keys())
        for k in ref:
            a, b = np.asarray(ref[k]), np.asarray(out[k])
            assert a.shape == b.shape, (k, a.shape, b.shape)
            np.testing.assert_allclose(
                a, b, atol=1e-6,
                err_msg=f"render_frame AOV {k!r} diverged from render "
                        f"(shadow={shadow})",
            )


def test_render_frame_sharded_matches_render_frame(dworld, cam_rays):
    """The multi-device frame path agrees with the single-device frame path
    (and hence, transitively, with render())."""
    from octree_raymarcher_tpu.parallel.mesh import make_mesh
    from octree_raymarcher_tpu.parallel.render_sharded import (
        pad_rays,
        render_frame_sharded,
    )
    from octree_raymarcher_tpu.shade import render_frame

    (origins, dirs), eye = cam_rays
    cfg = RenderConfig(shadow="none")
    ref = render_frame(dworld, origins, dirs, eye, cfg=cfg, tile=512)["rgb"]

    mesh = make_mesh(jax.devices()[:8])
    o, d, n = pad_rays(np.asarray(origins), np.asarray(dirs), 8)
    rgb = render_frame_sharded(mesh, dworld, o, d, eye, tile=64, cfg=cfg)[:n]
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(rgb), atol=1e-6,
        err_msg="render_frame_sharded diverged from render_frame",
    )
