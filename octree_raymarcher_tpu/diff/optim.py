"""Inverse rendering: fit per-voxel density/albedo to target views.

BASELINE config 3: render target images with the hard renderer, then
optimize VoxelParams with optax so the soft renderer reproduces them; the
per-view L2 photometric loss differentiates through composite() down to
every voxel parameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .composite import VoxelParams, composite
from .segments import sample_segments


def sample_views(world, views, max_segments: int = 32, max_steps: int = 512,
                 tile: int = 65536, compact: bool = False):
    """views: list of (origins, dirs, target_rgb).  Pre-samples segments once
    (geometry is fixed during param optimization) so each step is pure
    compositing — the big TPU win of splitting geometry from appearance.
    Returns a pytree of (segments, target) pairs to PASS INTO the jitted
    step as an argument.  Views bigger than ``tile`` rays sample host-tiled
    (sample_segments_frame) so each tile's marches gate on local worst
    rays.

    ``compact=True`` samples through the stage-compacted K-phase sampler
    (diff/segments_compact.py) — segment-for-segment identical, 4.26x
    less march lane work at 1080p (roofline_march.json sampler; the
    sampler's live set shrinks every phase, the worst lockstep profile).
    The sampling happens HERE, outside the jitted step, which is exactly
    where the multi-launch compact schedule is usable."""
    from .segments import sample_segments_frame

    if compact:
        from .segments_compact import sample_segments_compact

    cached = []
    for origins, dirs, target in views:
        if compact:
            segs, _ = sample_segments_compact(world, origins, dirs,
                                              max_segments, max_steps,
                                              tile=tile)
        else:
            segs = sample_segments_frame(world, origins, dirs, max_segments,
                                         max_steps, tile=tile)
        cached.append((jax.lax.stop_gradient(segs), jnp.asarray(target)))
    return cached


def photometric_loss(params: VoxelParams, cached):
    """Mean per-view L2 photometric loss over pre-sampled (segs, target)."""
    total = jnp.float32(0.0)
    for segs, target in cached:
        out = composite(segs, params)
        total = total + jnp.mean((out["rgb"] - target) ** 2)
    return total / len(cached)


def make_loss_fn(world, views, max_segments: int = 32, max_steps: int = 512):
    """Convenience closure form of (sample_views + photometric_loss).

    WARNING: the returned function closes over the cached segments/targets,
    so jitting IT bakes them in as executable constants — which serializes
    pool gathers (docs/PERF_NOTES.md single-carry cliff) and, through the
    axon tunnel, executing any jit with a large closed-over device array
    permanently degrades process dispatch (the round-3 poison bisect,
    tools/diag_poison.py).  Prefer fit()/photometric_loss, which pass the
    cached views as jit ARGUMENTS."""
    cached = sample_views(world, views, max_segments, max_steps)
    return lambda params: photometric_loss(params, cached)


def fit(
    world,
    views,
    params0: VoxelParams,
    steps: int = 100,
    lr: float = 0.05,
    max_segments: int = 32,
    compact: bool = False,
):
    """Run Adam on the photometric loss; returns (params, loss_history).
    ``compact=True`` pre-samples through the stage-compacted sampler
    (identical segments, ~4x less geometry-pass march work — see
    sample_views)."""
    cached = sample_views(world, views, max_segments, compact=compact)
    opt = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, cached):
        loss, grads = jax.value_and_grad(photometric_loss)(params, cached)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params = params0
    opt_state = opt.init(params)
    history = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, cached)
        # Collect DEVICE scalars; convert after the loop.  float(loss) here
        # would be a per-step device->host readback — the FIRST of which
        # permanently degrades dispatch through the axon tunnel
        # (docs/PERF_NOTES.md), turning a fit run ~1000x slow.
        history.append(loss)
    return params, [float(l) for l in history]


__all__ = ["sample_views", "photometric_loss", "make_loss_fn", "fit"]
