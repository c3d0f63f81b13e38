"""Sharded rendering/training must agree with the single-device path
(SURVEY.md section 2.8: ray-DP with replicated octree, deterministic
replicated edits)."""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from octree_raymarcher_tpu.parallel.mesh import make_mesh
from octree_raymarcher_tpu.parallel.render_sharded import pad_rays, render_sharded
from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
from octree_raymarcher_tpu.shade.render import RenderConfig, render
from octree_raymarcher_tpu.world.world import World


def test_sharded_render_matches_single_after_edits():
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=9,
                       water_level=4.0, amplitude=16.0)
    wa, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    # deterministic edit batch (the replicated-update path: every host
    # applies the same edits to its replica)
    dev = w.apply(wa, dev, w.destroy((10, 8, 10), (30, 20, 30)))
    dev = w.apply(wa, dev, w.build((20, 2, 20), (44, 26, 26), 3))

    cam = PerspectiveCamera(position=(32.0, 28.0, -16.0), pitch_deg=-25.0,
                            fov_deg=70.0, width=64, height=40)
    origins, dirs = cam.rays()
    eye = (32.0, 28.0, -16.0)
    cfg = RenderConfig(shadow="none", max_steps=256)

    single = render(dev, jnp.asarray(origins), jnp.asarray(dirs),
                    jnp.asarray(eye, dtype=jnp.float32), cfg=cfg)["rgb"]

    mesh = make_mesh(jax.devices()[:8])
    o, d, n = pad_rays(origins, dirs, 8)
    sharded = render_sharded(mesh, dev, jnp.asarray(o), jnp.asarray(d), eye,
                             cfg=cfg)[:n]

    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=1e-5,
        err_msg="sharded render diverged from single-device render",
    )


def test_fused_frame_matches_sharded_render():
    """The one-executable fused frame (what bench ships) agrees with the
    8-device sharded render on the same rays (VERDICT r4 #7)."""
    from octree_raymarcher_tpu.shade.render import render_frame

    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=9,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    cam = PerspectiveCamera(position=(32.0, 28.0, -16.0), pitch_deg=-25.0,
                            fov_deg=70.0, width=64, height=40)
    origins, dirs = cam.rays()
    eye = (32.0, 28.0, -16.0)
    cfg = RenderConfig(shadow="none", max_steps=256)

    fused = render_frame(dev, jnp.asarray(origins), jnp.asarray(dirs),
                         jnp.asarray(eye, dtype=jnp.float32), cfg=cfg,
                         tile=512, fused=True)["rgb"]

    mesh = make_mesh(jax.devices()[:8])
    o, d, n = pad_rays(origins, dirs, 8)
    sharded = render_sharded(mesh, dev, jnp.asarray(o), jnp.asarray(d), eye,
                             cfg=cfg)[:n]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(sharded),
                               atol=1e-5)


def test_compact_march_sharded_matches_plain_sharded():
    """Per-device stage compaction preserves every ray's walk: the
    sharded compact march equals march_sharded bit for bit, and each
    device reports its own executed-lane cost (VERDICT r4 weak #5)."""
    from octree_raymarcher_tpu.parallel.render_sharded import (
        march_sharded,
        march_sharded_compact,
    )

    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=9,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    cam = PerspectiveCamera(position=(32.0, 28.0, -16.0), pitch_deg=-25.0,
                            fov_deg=70.0, width=64, height=40)
    origins, dirs = cam.rays()
    o, d, n = pad_rays(origins, dirs, 8)
    mesh = make_mesh(jax.devices()[:8])

    hit0, t0, mat0 = march_sharded(mesh, dev, o, d, max_steps=128)
    hit1, t1, mat1, executed = march_sharded_compact(
        mesh, dev, o, d, max_steps=128, tile=64,
    )
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(mat0), np.asarray(mat1))
    ex = np.asarray(executed)
    assert ex.shape == (8,)
    assert (ex > 0).all()
    # the per-device lane costs are the utilization-imbalance signal: on a
    # screen-tiled frame at least two devices should differ
    assert len(set(ex.tolist())) > 1, ex


def _small_training_setup():
    import optax

    from octree_raymarcher_tpu.diff import init_params_from_world

    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=12.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    cam = PerspectiveCamera(position=(16.0, 26.0, -12.0), pitch_deg=-35.0,
                            fov_deg=70.0, width=32, height=16)
    origins, dirs = cam.rays()  # 512 rays = 64/device on the 8-mesh
    params = init_params_from_world(dev, solid_density=10.0)
    targets = jnp.zeros((origins.shape[0], 3), dtype=jnp.float32)
    opt = optax.adam(1e-2)
    return dev, jnp.asarray(origins), jnp.asarray(dirs), params, targets, opt


@pytest.mark.slow
def test_overlapped_grad_reduction_matches_blocking():
    """make_sharded_train_step(overlap=True) pipelines per-tile psums under
    the backward tile loop; results must match the blocking single-psum
    step up to float reassociation of the gradient sums."""
    from octree_raymarcher_tpu.parallel.render_sharded import (
        make_sharded_train_step,
    )

    dev, o, d, params, targets, opt = _small_training_setup()
    mesh = make_mesh(jax.devices()[:8])

    step_block = make_sharded_train_step(mesh, dev, opt, max_segments=8)
    step_olap = make_sharded_train_step(
        mesh, dev, opt, max_segments=8, overlap=True, grad_tiles=4
    )

    s0 = opt.init(params)
    pb, sb, lb = step_block(params, s0, dev, o, d, targets)
    po, so, lo = step_olap(params, s0, dev, o, d, targets)

    np.testing.assert_allclose(float(lb), float(lo), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(pb), jax.tree_util.tree_leaves(po)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg="overlapped grad reduction diverged from blocking psum",
        )


@pytest.mark.slow
def test_zero_sharded_optimizer_matches_replicated():
    """make_zero_train_step (reduce_scatter + sharded Adam + all_gather)
    must produce the same params/loss as the replicated-optimizer step."""
    from octree_raymarcher_tpu.parallel.render_sharded import (
        make_sharded_train_step,
        make_zero_train_step,
    )

    dev, o, d, params, targets, opt = _small_training_setup()
    mesh = make_mesh(jax.devices()[:8])

    step_ref = make_sharded_train_step(
        mesh, dev, opt, max_segments=8, overlap=True, grad_tiles=4
    )
    init_zero, step_zero = make_zero_train_step(
        mesh, dev, opt, max_segments=8, grad_tiles=4
    )

    sr = opt.init(params)
    sz = init_zero(params)

    pr, pz = params, params
    for _ in range(3):
        pr, sr, lr = step_ref(pr, sr, dev, o, d, targets)
        pz, sz, lz = step_zero(pz, sz, dev, o, d, targets)

    np.testing.assert_allclose(float(lr), float(lz), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(pr), jax.tree_util.tree_leaves(pz)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg="ZeRO-sharded optimizer step diverged from replicated",
        )

    # Optimizer state really is sharded: each array leaf of the zero state
    # is laid out over the mesh, not replicated.
    for leaf in jax.tree_util.tree_leaves(sz):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] >= 8:
            assert not leaf.sharding.is_fully_replicated, leaf.sharding
