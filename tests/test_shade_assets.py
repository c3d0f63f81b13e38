"""Texture atlas, PNG codec, and environment-map tests (reference parity:
src/Atlas.cpp, shaders/World.Fragment.glsl:5-15 leafUV tile addressing,
src/Skybox.cpp:84-107 infinite-depth sky sampling)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octree_raymarcher_tpu.shade.atlas import (
    atlas_from_sheet,
    default_atlas,
    load_atlas_png,
    save_atlas_png,
    sheet_from_atlas,
)
from octree_raymarcher_tpu.shade.envmap import default_envmap, sample_env
from octree_raymarcher_tpu.utils.png import load_png, save_png


def test_png_roundtrip_rgb_and_gray(tmp_path):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    save_png(p, rgb)
    np.testing.assert_array_equal(load_png(p), rgb)

    gray = rng.integers(0, 256, size=(9, 33), dtype=np.uint8)
    p2 = str(tmp_path / "g.png")
    save_png(p2, gray)
    np.testing.assert_array_equal(load_png(p2)[..., 0], gray)


def test_png_decodes_external_encoder(tmp_path):
    """Our decoder must handle filters 1-4 chosen by a real encoder."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    # Smooth gradient images make encoders pick Sub/Up/Average/Paeth.
    yy, xx = np.mgrid[0:64, 0:48]
    img = np.stack([yy * 3 % 256, xx * 5 % 256,
                    (yy + xx) * 2 % 256], axis=-1).astype(np.uint8)
    img[16:32] = rng.integers(0, 256, size=(16, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "pil.png")
    PIL.fromarray(img).save(p)
    np.testing.assert_array_equal(load_png(p), img)


def test_default_atlas_deterministic_and_tinted():
    a1 = default_atlas(resolution=16, seed=1)
    a2 = default_atlas(resolution=16, seed=1)
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (8, 16, 16, 3)
    assert (a1 >= 0).all() and (a1 <= 1).all()
    # tiles carry spatial variety (they're textures, not flat colors)
    for m in range(1, 7):
        assert a1[m].std() > 0.005, m


def test_atlas_sheet_leafuv_addressing(tmp_path):
    """sheet_from_atlas/atlas_from_sheet use the reference leafUV layout
    (x = m & 0xff, y = m >> 8; World.Fragment.glsl:10-12)."""
    atlas = default_atlas(resolution=8, seed=2)
    sheet = sheet_from_atlas(atlas)
    assert sheet.shape == (8, 8 * 8, 3)  # 8 materials in one row
    # material m's tile sits at columns [m*8, (m+1)*8)
    for m in range(8):
        tile = sheet[:, m * 8 : (m + 1) * 8].astype(np.float32) / 255.0
        np.testing.assert_allclose(tile, atlas[m], atol=1 / 255.0 + 1e-6)

    p = str(tmp_path / "atlas.png")
    save_atlas_png(p, atlas)
    back = load_atlas_png(p, 8)
    np.testing.assert_allclose(back, atlas, atol=1 / 255.0 + 1e-6)
    np.testing.assert_array_equal(back, atlas_from_sheet(load_png(p), 8))


def test_envmap_sampling_directions():
    """Cardinal directions land on the expected equirect texels."""
    H, W = 8, 16
    env = np.zeros((H, W, 3), dtype=np.float32)
    env[0, :] = (1, 0, 0)        # zenith row
    env[-1, :] = (0, 1, 0)       # nadir row
    out = sample_env(env, np.asarray([[0.0, 1.0, 0.0]]), bilinear=False)
    np.testing.assert_allclose(np.asarray(out), [[1, 0, 0]])
    out = sample_env(env, np.asarray([[0.0, -1.0, 0.0]]), bilinear=False)
    np.testing.assert_allclose(np.asarray(out), [[0, 1, 0]])

    # +x direction: u = 0.5 -> column W/2 at the equator row.
    env2 = np.zeros((H, W, 3), dtype=np.float32)
    env2[H // 2, W // 2] = (0, 0, 1)
    out = sample_env(env2, np.asarray([[1.0, 0.0, 0.0]]), bilinear=False)
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 1]])


def test_envmap_miss_pixels_and_gradient():
    """Hard render misses sample the envmap; soft-composite gradients flow
    into envmap texels (finite-difference check)."""
    from octree_raymarcher_tpu.diff import init_params_from_world, render_soft
    from octree_raymarcher_tpu.shade import RenderConfig, render
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.world.world import World

    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=10.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    cam = PerspectiveCamera(position=(16.0, 24.0, -14.0), pitch_deg=0.0,
                            fov_deg=70.0, width=16, height=12)
    origins, dirs = cam.rays()
    env = jnp.asarray(default_envmap(16, 32))

    out = render(dev, origins, dirs, cam.position, cfg=RenderConfig(),
                 envmap=env)
    hit = np.asarray(out["hit"])
    assert (~hit).any()
    # miss pixels match direct env samples
    sky = np.asarray(sample_env(env, dirs))
    np.testing.assert_allclose(
        np.asarray(out["rgb"])[~hit], sky[~hit], rtol=1e-6, atol=1e-6
    )

    params = init_params_from_world(dev)

    def loss(e):
        rgb = render_soft(dev, params, origins, dirs, max_segments=8,
                          envmap=e)["rgb"]
        return jnp.mean(rgb ** 2)

    g = jax.grad(loss)(env)
    g = np.asarray(g)
    assert np.abs(g).sum() > 0
    # FD check on the strongest texel
    idx = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 1e-2
    ep = np.asarray(env).copy(); ep[idx] += eps
    em = np.asarray(env).copy(); em[idx] -= eps
    fd = (float(loss(jnp.asarray(ep))) - float(loss(jnp.asarray(em)))) / (2 * eps)
    assert np.isclose(fd, g[idx], rtol=5e-2, atol=1e-5), (fd, g[idx])
