"""Sharded rendering/training must agree with the single-device path
(SURVEY.md section 2.8: ray-DP with replicated octree, deterministic
replicated edits)."""

import copy

import numpy as np
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
