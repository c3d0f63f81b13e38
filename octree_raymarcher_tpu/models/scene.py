"""VoxelScene — the flagship model: a differentiable voxel world.

Bundles the device world (octree geometry), per-voxel appearance parameters,
lights and materials, and exposes the three jittable entry points the
framework is benchmarked on:

  * ``forward_hard``  — the production render pass (march + Blinn-Phong),
  * ``forward_soft``  — the differentiable render (segments + compositing),
  * ``train_step``    — one optimization step of the voxel parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diff.composite import VoxelParams, init_params_from_world, render_soft
from ..diff.segments import sample_segments
from ..diff.composite import composite
from ..shade.lights import LightRig
from ..shade.materials import MaterialTable
from ..shade.render import RenderConfig, render
from ..world.device import DeviceWorld, single_chunk_world
from ..worldgen import BoundsPyramid, grow


@dataclasses.dataclass
class VoxelScene:
    world: DeviceWorld
    params: VoxelParams
    lights: LightRig
    materials: MaterialTable
    cfg: RenderConfig = RenderConfig()

    @staticmethod
    def demo(chunk_size: float = 32.0, depth: int = 5, seed: int = 11) -> "VoxelScene":
        """Small noise-terrain scene (fits any backend; used by the graft entry)."""
        pyr = BoundsPyramid.generate(
            size=int(chunk_size), amplitude=chunk_size / 4, period=1.0 / chunk_size,
            xshift=0.0, yshift=chunk_size * 0.4, zshift=0.0, seed=seed,
        )
        chunk = grow([0.0, 0.0, 0.0], chunk_size, depth=depth, pyr=pyr)
        world = single_chunk_world(chunk)
        params = init_params_from_world(world)
        return VoxelScene(
            world=world,
            params=params,
            lights=LightRig.default(),
            materials=MaterialTable.default(),
        )

    # -- jittable functions ------------------------------------------------
    def forward_hard(self, origins, dirs, eye):
        out = render(
            self.world, origins, dirs, eye, self.lights, self.materials, self.cfg
        )
        return out["rgb"]

    def forward_soft(self, params: VoxelParams, origins, dirs):
        return render_soft(self.world, params, origins, dirs)["rgb"]

    def loss(self, params: VoxelParams, origins, dirs, target):
        rgb = self.forward_soft(params, origins, dirs)
        return jnp.mean((rgb - target) ** 2)

    def make_train_step(self, lr: float = 0.05):
        opt = optax.adam(lr)

        # The world travels as a jit ARGUMENT: closing over the device
        # pools would bake them into the executable as constants, which
        # serializes every in-loop pool gather ~300x (docs/PERF_NOTES.md)
        # and — through the axon tunnel — executing a jit with large
        # closed-over device arrays permanently degrades process dispatch
        # (round-3 poison bisect, tools/diag_poison.py).
        @jax.jit
        def train_step(world, params, opt_state, origins, dirs, target):
            segs = jax.lax.stop_gradient(sample_segments(world, origins, dirs))

            def loss_fn(p):
                out = composite(segs, p)
                return jnp.mean((out["rgb"] - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step, opt.init(self.params)


__all__ = ["VoxelScene"]
