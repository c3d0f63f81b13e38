"""Stage-compacted frame march: re-pack live rays between march stages.

The lockstep march wastes lanes on finished rays: a tile's while-loop runs
to ITS worst ray, so at tile 65536 only 26.6% of executed lane-iterations
are live steps on the 1080p bench scene, and the measured ceiling of
re-packing live rays densely between stages is 0.795 (tile 65536) / 0.944
(tile 8192) — `roofline_march.json lane_utilization_perfect_compaction`,
docs/PERF_NOTES.md r4.  This module implements that re-packing, FUSED
(round 5; VERDICT r4 #2): the whole frame costs ~one launch per stage
instead of the round-4 prototype's ~stages*tiles dispatches.

  * the frame is marched in STAGES from a ``schedule`` of per-stage loop
    iteration counts; each stage is ONE jitted executable that advances
    every ray tile's packed single-int32 march state (ops/march_jnp.py
    ``run_fast_loop`` — the march kernel itself is untouched and each
    tile's while-loop stays top-level in the stage body), then STABLY
    re-packs unfinished rays into a dense prefix with a cumsum-built
    permutation (no sort, no host readback);
  * tiles whose rays are all finished exit their while loop at the first
    cond check (~zero device lane work), which is where the win comes
    from once live rays are packed;
  * only the in-flight arrays (o, d, packed state, source index, coarse
    step count) ride through the permutation — finished rays simply stop
    changing and are decoded ONCE at the end by the same ``reconstruct``
    march() itself uses, then scattered back to source order.  Every ray
    marches exactly the same cell sequence as the plain path, so
    hit/t/material/cell/texel are BIT-IDENTICAL to march_frame
    (tests/test_march_compact.py asserts it);
  * the executed-lane accounting (sum over stages and tiles of
    tile_width * actual_tile_trip_count) is computed on device and
    returned, so the utilization win is verifiable without any timing —
    the only kind of device-efficiency evidence available on this
    harness (PERF_NOTES r4).

Per-stage overhead outside the loops (honesty note): each stage also pays
~10 O(N) vectorized passes (the permutation gathers + cumsum) and the
final decode pays one point-location over the frame.  That cost is
loop-free streaming work the lane accounting deliberately does NOT count;
coarser late-stage strides (the default schedule doubles the stride as
the live set thins) bound the number of stages.

Reference anchor: the per-pixel early exit the GPU marcher gets for free
from SIMT divergence hardware (shaders/Chunkmarch.glsl:251-294's `while`
breaks) — re-created on a lockstep vector machine by packing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.constants import MAX_STEPS
from ..world.device import DeviceWorld
from .march_jnp import (
    MarchResult,
    entry_state,
    reconstruct,
    resume_state,
    run_fast_loop,
)

_UNROLL = 4  # the march loop's unroll; every stage bound must divide by it


def default_schedule(max_steps: int, stride: int = 16) -> tuple:
    """Stage schedule covering ``max_steps`` loop iterations: ``stride``
    iterations per stage for the first half of the budget, then doubling
    strides (the live set thins roughly geometrically on real frames, so
    late fine stages buy little utilization but cost a launch + an O(N)
    re-pack each).  Every entry is a multiple of the march unroll (4) and
    the effective totals match one plain march of ``max_steps`` exactly
    (both round up to the unroll), keeping bit-identity."""
    if stride % _UNROLL:
        raise ValueError(f"stride must be a multiple of {_UNROLL}, got {stride}")
    total = -(-max_steps // _UNROLL) * _UNROLL
    sched = []
    covered = 0
    step = stride
    while covered < total:
        if covered >= total // 2 and len(sched) >= 2:
            step = min(step * 2, total - covered)
            step = -(-step // _UNROLL) * _UNROLL
        take = min(step, total - covered)
        sched.append(take)
        covered += take
    return tuple(sched)


def _validate_schedule(schedule, max_steps):
    eff = sum(-(-s // _UNROLL) * _UNROLL for s in schedule)
    want = -(-max_steps // _UNROLL) * _UNROLL
    if eff != want:
        raise ValueError(
            f"schedule {schedule} covers {eff} effective iterations, but "
            f"max_steps={max_steps} needs exactly {want} (each stage rounds "
            f"up to the march unroll {_UNROLL}) for bit-identity with the "
            "plain march"
        )
    for s in schedule[:-1]:
        if s % _UNROLL:
            raise ValueError(
                f"every non-final stage bound must be a multiple of the "
                f"march unroll ({_UNROLL}); got {schedule}"
            )


def _compact(cont, arrays):
    """Stable partition: rays with ``cont``=1 move to a dense prefix (in
    order), the rest follow (in order).  Cumsum-built permutation — O(N),
    no sort.  Returns (permuted arrays, live_count)."""
    m = cont.shape[0]
    live_count = jnp.sum(cont)
    idx_live = jnp.cumsum(cont) - cont
    idx_dead = live_count + jnp.cumsum(1 - cont) - (1 - cont)
    dest = jnp.where(cont == 1, idx_live, idx_dead)
    perm = jnp.zeros(m, dtype=jnp.int32).at[dest].set(
        jnp.arange(m, dtype=jnp.int32)
    )

    def take(x):
        if x.ndim == 1:
            return x[perm]
        # per-column 1D gathers (2D row gathers serialize on TPU;
        # docs/PERF_NOTES.md)
        return jnp.stack([x[:, j][perm] for j in range(x.shape[1])], axis=-1)

    return tuple(take(x) for x in arrays), live_count


@jax.jit
def _prologue(world, o, d, live_start):
    """Entry slab test + initial packing: returns the in-flight tuple
    (o, d, state, orig, steps, live_count) with live rays in a dense
    prefix.  ONE launch.  live_start all-ones == march's no-mask entry
    (the mask multiplies by 1, bit-exact)."""
    m = o.shape[0]
    state = entry_state(world, o, d, live_start)
    cont = 1 - ((state >> 31) & 1)
    orig = jnp.arange(m, dtype=jnp.int32)
    steps = jnp.zeros(m, dtype=jnp.int32)
    (o, d, state, orig, steps), live_count = _compact(
        cont, (o, d, state, orig, steps)
    )
    return o, d, state, orig, steps, live_count


@functools.partial(
    jax.jit, static_argnames=("stage_steps", "tile", "assume_resident")
)
def _stage(world, o, d, state, orig, steps, live_count, executed,
           stage_steps, tile, assume_resident):
    """One compacted march stage as ONE executable: per-tile fast loops
    (each while loop top-level in this jit body; all-dead tiles exit at
    the first cond check), coarse step charging, executed-lane
    accounting, and the live-prefix re-pack."""
    m = state.shape[0]
    prev_live = 1 - ((state >> 31) & 1)

    parts, ks = [], []
    for i in range(0, m, tile):
        st, k = run_fast_loop(world, o[i:i + tile], d[i:i + tile],
                              state[i:i + tile], stage_steps,
                              assume_resident=assume_resident)
        parts.append(st)
        ks.append(k)
    state = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    # executed lane-iterations this stage: every lane of tile i ran k_i
    # loop iterations in lockstep (k_i = 0 for all-dead tiles).
    k_sum = ks[0] if len(ks) == 1 else sum(ks)
    executed = executed + jnp.int32(tile) * k_sum
    # coarse per-ray step charge (march steps_aov="coarse" semantics:
    # true <= charged <= true + stage bound), per tile's actual trips
    k_lane = (
        jnp.broadcast_to(ks[0], (tile,)) if len(ks) == 1
        else jnp.concatenate(
            [jnp.broadcast_to(k, (tile,)) for k in ks]
        )
    )
    steps = steps + prev_live * k_lane

    cont = 1 - ((state >> 31) & 1)
    (o, d, state, orig, steps), live_count = _compact(
        cont, (o, d, state, orig, steps)
    )
    return o, d, state, orig, steps, live_count, executed


@functools.partial(jax.jit, static_argnames=("assume_resident",))
def _finalize(world, o, d, state, orig, steps, assume_resident):
    """Decode every frozen state with march()'s own reconstruction and
    scatter the MarchResult back to source order.  ONE launch."""
    res = reconstruct(world, o, d, state, assume_resident=assume_resident)
    m = state.shape[0]

    def unperm(x, dtype=None):
        out = jnp.zeros((m,) + x.shape[1:], dtype=dtype or x.dtype)
        return out.at[orig].set(x)

    return MarchResult(
        hit=unperm(res.hit),
        t=unperm(res.t),
        material=unperm(res.material),
        cell_bmin=unperm(res.cell_bmin),
        cell_size=unperm(res.cell_size),
        steps=unperm(steps),
        texel=unperm(res.texel),
    )


class CompactFrameState:
    """In-flight state of a stage-compacted march (permuted ray order).
    Produced by compact_begin, advanced by compact_stage, decoded by
    compact_finish.  The segment sampler threads one of these across its
    K phases so live rays stay densely packed phase-to-phase
    (diff/segments_compact.py)."""

    __slots__ = ("o", "d", "state", "orig", "steps", "live_count",
                 "executed")

    def __init__(self, o, d, state, orig, steps, live_count, executed):
        self.o, self.d, self.state, self.orig = o, d, state, orig
        self.steps, self.live_count = steps, live_count
        self.executed = executed


def _pad_rays(origins, dirs, tile, live_start=None):
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
        if live_start is not None:
            live_start = jnp.concatenate(
                [jnp.asarray(live_start).astype(jnp.int32),
                 jnp.zeros(pad, dtype=jnp.int32)]
            )
    return o, d, n, live_start


def compact_begin(world, origins, dirs, tile=65536, live_start=None):
    """Pad + entry-test + initial pack.  Returns CompactFrameState."""
    o, d, n, ls = _pad_rays(origins, dirs, tile, live_start)
    if ls is None:
        ls = jnp.ones(o.shape[0], dtype=jnp.int32)
    o, d, state, orig, steps, live_count = _prologue(world, o, d, ls)
    return CompactFrameState(o, d, state, orig, steps, live_count,
                             jnp.int32(0)), n


def compact_stages(world, st: CompactFrameState, schedule, tile,
                   assume_resident=False):
    """Run the stage schedule over the in-flight state (one launch per
    stage).  Mutates and returns ``st``."""
    for stage_steps in schedule:
        (st.o, st.d, st.state, st.orig, st.steps, st.live_count,
         st.executed) = _stage(
            world, st.o, st.d, st.state, st.orig, st.steps, st.live_count,
            st.executed, stage_steps, tile, assume_resident,
        )
    return st


def compact_finish(world, st: CompactFrameState, n,
                   assume_resident=False) -> MarchResult:
    """Decode + unpermute to source order, sliced to the caller's n."""
    res = _finalize(world, st.o, st.d, st.state, st.orig, st.steps,
                    assume_resident)
    sl = slice(0, n)
    return MarchResult(
        hit=res.hit[sl], t=res.t[sl], material=res.material[sl],
        cell_bmin=res.cell_bmin[sl], cell_size=res.cell_size[sl],
        steps=res.steps[sl], texel=res.texel[sl],
    )


def march_frame_compact(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    tile: int = 65536,
    stride: int = 16,
    assume_resident: bool = False,
    live_start=None,
    schedule=None,
):
    """March a frame with between-stage live-ray compaction, fused to
    ~one launch per stage (len(schedule) + 2 launches per frame).

    Returns ``(MarchResult, executed_lane_iters)`` where the second value
    is a device int32 scalar: sum over stages and tiles of tile_width *
    that tile's actual while-loop trip count — the lane-iteration cost
    the compacted schedule pays (compare against the uncompacted cost
    from the steps AOV; int32 bounds it to frames up to ~4M rays at 512
    steps).

    Results are bit-identical to ``march_frame(world, origins, dirs,
    max_steps, tile=tile, assume_resident=assume_resident)`` — the same
    march kernel walks the same cells; only the lane schedule differs.
    The ``steps`` AOV carries march's coarse-mode charge (quantized up to
    each stage bound), not exact counts.

    ``stride`` must be a multiple of the march unroll (4); ``schedule``
    overrides the default stage plan (see default_schedule) and is
    validated to cover exactly the plain march's effective iterations."""
    if schedule is None:
        schedule = default_schedule(max_steps, stride)
    _validate_schedule(schedule, max_steps)
    world = jax.tree_util.tree_map(jnp.asarray, world)

    st, n = compact_begin(world, origins, dirs, tile, live_start)
    st = compact_stages(world, st, schedule, tile, assume_resident)
    res = compact_finish(world, st, n, assume_resident)
    return res, st.executed


__all__ = [
    "march_frame_compact",
    "default_schedule",
    "compact_begin",
    "compact_stages",
    "compact_finish",
    "CompactFrameState",
]
