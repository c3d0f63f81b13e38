"""Ray-sharded rendering and training over a device mesh.

The TPU replacement for the reference's single-GPU fragment fan-out: the ray
batch (a flattened screen-tile grid) shards over the ``rays`` mesh axis via
shard_map, the octree pools and voxel parameters are replicated, and for
training each device composites its ray shard and contributes voxel-parameter
gradients through a psum over ICI.  The padded ray count must divide evenly
by the mesh size (pad_rays helps).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..diff.composite import VoxelParams, composite
from ..diff.segments import sample_segments
from ..ops.march_jnp import march
from ..shade.render import RenderConfig, render
from .mesh import RAYS_AXIS


def pad_rays(origins, dirs, n_shards: int):
    """Pad the ray batch to a multiple of n_shards with away-pointing rays."""
    import numpy as np

    n = origins.shape[0]
    pad = (-n) % n_shards
    if pad == 0:
        return origins, dirs, n
    o = np.concatenate([origins, np.full((pad, 3), 1e8, dtype=np.float32)])
    d = np.concatenate([dirs, np.tile(np.array([[0, 1, 0]], np.float32), (pad, 1))])
    return o, d, n


def render_sharded(mesh: Mesh, world, origins, dirs, eye, **render_kwargs):
    """Forward render with rays sharded across the mesh; pools replicated.

    Each device marches its whole shard in ONE top-level while loop
    (cfg.tile is forced to 0): nesting the march in lax.map inside
    shard_map would serialize the pool gathers (docs/PERF_NOTES.md).  For
    big frames prefer render_frame_sharded, which adds host tiling."""
    cfg = render_kwargs.pop("cfg", RenderConfig())
    cfg = dataclasses.replace(cfg, tile=0)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS)),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )
    def _shard(world_, o, d):
        out = render(world_, o, d, eye, cfg=cfg, **render_kwargs)
        return out["rgb"]

    return _shard(world, jnp.asarray(origins), jnp.asarray(dirs))


def render_frame_sharded(
    mesh: Mesh, world, origins, dirs, eye, tile: int = 65536, **render_kwargs
):
    """Host-tiled + ray-sharded frame: the ray batch is cut into groups of
    ``n_devices * tile`` rays; each group is one shard_map dispatch where
    every device marches a ``tile``-ray block in a top-level loop.  Host
    dispatch is asynchronous, so groups pipeline on the devices — the
    multi-device analog of shade.render_frame."""
    n_dev = mesh.devices.size
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    group = n_dev * tile
    pad = (-n) % group
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
        )
    outs = []
    for i in range(0, o.shape[0], group):
        outs.append(
            render_sharded(mesh, world, o[i:i + group], d[i:i + group], eye,
                           **render_kwargs)
        )
    return jnp.concatenate(outs)[:n]


def march_sharded(mesh: Mesh, world, origins, dirs, max_steps: int = 512):
    """Sharded forward march returning (hit, t, material) per ray."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAYS_AXIS), P(RAYS_AXIS)),
        out_specs=(P(RAYS_AXIS), P(RAYS_AXIS), P(RAYS_AXIS)),
        check_vma=False,
    )
    def _shard(world_, o, d):
        res = march(world_, o, d, max_steps)
        return res.hit, res.t, res.material

    return _shard(world, jnp.asarray(origins), jnp.asarray(dirs))


def make_sharded_train_step(mesh: Mesh, world, optimizer, max_segments: int = 32):
    """Returns a jitted train step: rays+targets sharded, params replicated,
    per-voxel grads psum'd over the rays axis before the optimizer update —
    the collective rides ICI, exactly the scaling-book DP recipe."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(RAYS_AXIS), P(RAYS_AXIS), P(RAYS_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _grad_shard(world_, params, o, d, target):
        segs = jax.lax.stop_gradient(
            sample_segments(world_, o, d, max_segments)
        )

        def loss_fn(p):
            out = composite(segs, p)
            return jnp.sum((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, RAYS_AXIS)
        grads = jax.lax.psum(grads, RAYS_AXIS)
        return loss, grads

    @jax.jit
    def train_step(params: VoxelParams, opt_state, world_, origins, dirs, targets):
        n = origins.shape[0]
        loss, grads = _grad_shard(world_, params, origins, dirs, targets)
        loss = loss / n
        grads = jax.tree_util.tree_map(lambda g: g / n, grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


__all__ = [
    "pad_rays",
    "render_sharded",
    "render_frame_sharded",
    "march_sharded",
    "make_sharded_train_step",
]
