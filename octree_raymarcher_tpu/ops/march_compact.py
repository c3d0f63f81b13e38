"""Stage-compacted frame march: re-pack live rays between march stages.

The lockstep march wastes lanes on finished rays: a tile's while-loop runs
to ITS worst ray, so at tile 65536 only 26.6% of executed lane-iterations
are live steps on the 1080p bench scene, and the measured ceiling of
re-packing live rays densely between stages is 0.795 (tile 65536) / 0.944
(tile 8192) — `roofline_march.json lane_utilization_perfect_compaction`,
docs/PERF_NOTES.md r4.  This module implements that re-packing:

  * the frame is marched in STAGES of ``stride`` loop iterations; each
    stage dispatches the existing resumable single-carry march
    (ops/march_jnp.py ``t_start``/``live_start`` — the same mechanism the
    segment sampler uses, plus ``_expose_live_t`` so cap-reached rays
    report their resume parameter), per ``tile`` rays, so every
    while-loop stays top-level and the march kernel itself is untouched;
  * between stages, rays are STABLY SORTED by liveness (device argsort —
    no host readback) so unfinished rays occupy a dense prefix; tiles
    whose rays are all finished exit their next stage at the first cond
    check (~zero device work);
  * per-ray results accumulate in the permuted order and un-permute once
    at the end; every ray marches exactly the same cell sequence as the
    plain path, so hit/t/material/cell/texel are BIT-IDENTICAL to
    march_frame (tests/test_march_compact.py asserts it);
  * the executed-lane accounting (ceil(live/tile)*tile*stride per stage)
    is computed on device and returned, so the utilization win is
    verifiable without any timing — the only kind of device-efficiency
    evidence available on this harness (PERF_NOTES r4).

Cost per stage: one [N] argsort + ~10 gathers/selects over [N] or [N,3]
arrays, plus tiles-per-frame small dispatches.  On the axon relay the
extra dispatches dominate (this path is for directly-attached hardware,
where a dispatch is ~10 us and lane-iterations are the scarce resource);
the default render path remains march_frame / the fused frame.

Reference anchor: the per-pixel early exit the GPU marcher gets for free
from SIMT divergence hardware (shaders/Chunkmarch.glsl:251-294's `while`
breaks) — re-created on a lockstep vector machine by sorting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.constants import MAX_STEPS
from ..world.device import DeviceWorld
from .march_jnp import MarchResult, march


@functools.partial(jax.jit, static_argnames=("max_steps", "assume_resident"))
def _stage_entry(world, o, d, max_steps, assume_resident, live):
    return march(world, o, d, max_steps, assume_resident=assume_resident,
                 live_start=live, _check_const_pools=False,
                 _expose_live_t=True)


@functools.partial(jax.jit, static_argnames=("max_steps", "assume_resident"))
def _stage_resume(world, o, d, max_steps, assume_resident, live, t_start):
    return march(world, o, d, max_steps, assume_resident=assume_resident,
                 live_start=live, t_start=t_start, _check_const_pools=False,
                 _expose_live_t=True)


@jax.jit
def _compact_perm(finished):
    """Stable permutation putting unfinished rays (key 0) first."""
    return jnp.argsort(finished, stable=True)


@jax.jit
def _apply_perm(perm, o, d, t_cur, live, orig, hit_a, t_a, mat_a, cbm_a,
                csz_a, tex_a):
    return (o[perm], d[perm], t_cur[perm], live[perm], orig[perm],
            hit_a[perm], t_a[perm], mat_a[perm], cbm_a[perm], csz_a[perm],
            tex_a[perm])


@jax.jit
def _merge_stage(live_in, hit, t, material, cell_bmin, cell_size, texel,
                 t_cur, hit_a, t_a, mat_a, cbm_a, csz_a, tex_a):
    """Fold one stage's tile-concatenated MarchResult fields into the
    running accumulators.  A ray that entered live is, after the stage:
    hit (t = hit t), dead (t = inf), or still marching (t finite, not
    hit — the _expose_live_t resume parameter)."""
    live_in = live_in.astype(jnp.int32)
    hit_i = hit.astype(jnp.int32) * live_in
    cont = live_in * (1 - hit_i) * jnp.isfinite(t).astype(jnp.int32)
    died = live_in * (1 - hit_i) * (1 - cont)
    fin_now = hit_i + died

    sel = fin_now.astype(jnp.bool_)
    hit_a = jnp.where(sel, hit, hit_a)
    # dead rays keep the plain path's miss encoding: t = inf
    t_a = jnp.where(sel, t, t_a)
    mat_a = jnp.where(sel, material, mat_a)
    cbm_a = jnp.where(sel[:, None], cell_bmin, cbm_a)
    csz_a = jnp.where(sel, cell_size, csz_a)
    tex_a = jnp.where(sel, texel, tex_a)

    t_next = jnp.where(cont.astype(jnp.bool_), t, t_cur)
    finished = 1 - cont  # sort key: 0 = keep marching (front), 1 = done
    return (finished, cont, t_next, hit_a, t_a, mat_a, cbm_a, csz_a, tex_a,
            jnp.sum(cont))


@jax.jit
def _unpermute(orig, hit_a, t_a, mat_a, cbm_a, csz_a, tex_a):
    inv = jnp.argsort(orig)
    return (hit_a[inv], t_a[inv], mat_a[inv], cbm_a[inv], csz_a[inv],
            tex_a[inv])


def march_frame_compact(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    tile: int = 65536,
    stride: int = 32,
    assume_resident: bool = False,
):
    """March a frame with between-stage live-ray compaction.

    Returns ``(MarchResult, executed_lane_iters)`` where the second value
    is a device int32 scalar: sum over stages of ceil(live/tile) * tile *
    stride — the lane-iteration cost the compacted schedule pays (compare
    against the uncompacted cost from the steps AOV).

    Results are bit-identical to ``march_frame(world, origins, dirs,
    max_steps, tile=tile, assume_resident=assume_resident)`` — the same
    march kernel walks the same cells; only the lane schedule differs.
    ``stride`` should be a multiple of the march's unroll (4)."""
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                                 (pad, 3))]
        )
    m = o.shape[0]
    stages = (max_steps + stride - 1) // stride

    orig = jnp.arange(m, dtype=jnp.int32)
    t_cur = jnp.zeros(m, dtype=jnp.float32)
    live = jnp.ones(m, dtype=jnp.int32)
    hit_a = jnp.zeros(m, dtype=jnp.bool_)
    t_a = jnp.full(m, jnp.inf, dtype=jnp.float32)
    mat_a = jnp.zeros(m, dtype=jnp.int32)
    cbm_a = jnp.zeros((m, 3), dtype=jnp.float32)
    csz_a = jnp.zeros(m, dtype=jnp.float32)
    tex_a = jnp.full(m, -1, dtype=jnp.int32)

    executed = jnp.int32(0)
    live_count = jnp.int32(m)

    for stage in range(stages):
        # Lane cost of this stage under the compacted layout: only tiles
        # containing a live ray run their loops (the rest exit at the
        # first cond check).  live_count is a device scalar — no readback.
        stage_steps = min(stride, max_steps - stage * stride)
        tiles_live = (live_count + (tile - 1)) // tile
        executed = executed + tiles_live * jnp.int32(tile * stage_steps)

        outs = []
        for i in range(0, m, tile):
            sl = slice(i, i + tile)
            if stage == 0:
                res = _stage_entry(world, o[sl], d[sl], stage_steps,
                                   assume_resident, live[sl])
            else:
                res = _stage_resume(world, o[sl], d[sl], stage_steps,
                                    assume_resident, live[sl], t_cur[sl])
            outs.append(res)

        def cat(f):
            parts = [getattr(r, f) for r in outs]
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

        (finished, live, t_cur, hit_a, t_a, mat_a, cbm_a, csz_a, tex_a,
         live_count) = _merge_stage(
            live, cat("hit"), cat("t"), cat("material"), cat("cell_bmin"),
            cat("cell_size"), cat("texel"), t_cur,
            hit_a, t_a, mat_a, cbm_a, csz_a, tex_a,
        )
        if stage == stages - 1:
            break
        perm = _compact_perm(finished)
        (o, d, t_cur, live, orig, hit_a, t_a, mat_a, cbm_a, csz_a,
         tex_a) = _apply_perm(perm, o, d, t_cur, live, orig, hit_a, t_a,
                              mat_a, cbm_a, csz_a, tex_a)

    hit_a, t_a, mat_a, cbm_a, csz_a, tex_a = _unpermute(
        orig, hit_a, t_a, mat_a, cbm_a, csz_a, tex_a
    )
    sl = slice(0, n)
    res = MarchResult(
        hit=hit_a[sl], t=t_a[sl], material=mat_a[sl], cell_bmin=cbm_a[sl],
        cell_size=csz_a[sl], steps=jnp.zeros(n, dtype=jnp.int32),
        texel=tex_a[sl],
    )
    return res, executed


__all__ = ["march_frame_compact"]
