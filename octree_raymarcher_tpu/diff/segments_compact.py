"""Stage-compacted segment sampler: the K-phase sampler with live rays
re-packed densely ACROSS phases and stages (VERDICT r4 #3).

The plain sampler (diff/segments.py) runs K phases of the fast march per
ray tile; its live set SHRINKS every phase (a ray with j < K solid cells
is dead from phase j on), which is the worst possible lockstep profile —
every phase's tile loop still runs to the tile's worst surviving ray.
This module threads ONE CompactFrameState (ops/march_compact.py) through
all K phases:

  * each phase marches the in-flight packed state with the stage-compacted
    schedule (one launch per stage; all-dead tiles exit at the first cond
    check);
  * at the phase boundary, ONE executable decodes the frozen states with
    march()'s own ``reconstruct``, scatters the phase's hit record back to
    source order, extracts the segment exactly as sample_segments does
    (same escape/slot/cursor formulas — factored, not copied), re-packs
    the still-sampling rays, and re-enters the next phase;
  * segments therefore come out segment-for-segment IDENTICAL to
    sample_segments (tests/test_diff_compact.py asserts it), while the
    executed-lane accounting records what the compacted schedule actually
    paid.

Step budgets (the training-cap feature) are not supported here — the
budgeted sampler charges per-ray strides that cannot ride the single-int32
carry; use sample_segments(step_budget=...) for capped training runs.

Reference anchor: ParallaxAlpha.Fragment.glsl:200-353 marches and
composites per pixel with SIMT early-exit; this is the lockstep-packed
equivalent of its per-pixel loop termination.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.geometry import inv_dir
from ..ops.march_compact import (
    CompactFrameState,
    _compact,
    _pad_rays,
    _prologue,
    compact_stages,
    default_schedule,
)
from ..ops.march_jnp import reconstruct, resume_state
from ..world.device import DeviceWorld
from .segments import SegmentBatch, _extract_jit


@functools.partial(jax.jit, static_argnames=("assume_resident",))
def _phase_decode(world, o, d, state, orig, assume_resident):
    """Decode the frozen phase states with march()'s own reconstruction
    and scatter the hit record back to source order."""
    res = reconstruct(world, o, d, state, assume_resident=assume_resident)
    m = state.shape[0]

    def unperm(x):
        out = jnp.zeros((m,) + x.shape[1:], dtype=x.dtype)
        return out.at[orig].set(x)

    return (unperm(res.hit), unperm(res.t), unperm(res.cell_bmin),
            unperm(res.cell_size), unperm(res.texel), unperm(res.material))


@jax.jit
def _phase_repack(o, d, orig, steps, count, t_next, live_next):
    """Re-enter the permuted in-flight space and pack the surviving rays
    densely for the next phase."""
    count = count + live_next
    t_next_p = t_next[orig]
    live_p = live_next[orig]
    state_p = resume_state(t_next_p, live_p)
    (o, d, state_p, orig, steps), live_count = _compact(
        live_p, (o, d, state_p, orig, steps)
    )
    return count, o, d, state_p, orig, steps, live_count


def sample_segments_compact(
    world: DeviceWorld,
    origins,
    dirs,
    max_segments: int = 32,
    max_steps: int = 512,
    num_materials: int = 8,
    tile: int = 65536,
    stride: int = 16,
    schedule=None,
    assume_resident: bool = False,
):
    """Collect up to ``max_segments`` solid segments per ray with the
    stage-compacted schedule.  Returns ``(SegmentBatch,
    executed_per_phase)`` where the second value is a list of K device
    int32 scalars (lane-iterations each phase actually executed; summing
    on the host avoids int32 overflow across phases).

    Segment-for-segment identical to ``sample_segments(world, origins,
    dirs, max_segments, max_steps, num_materials)``; launches ~K *
    (len(schedule) + 1)."""
    if schedule is None:
        schedule = default_schedule(max_steps, stride)
    world = jax.tree_util.tree_map(jnp.asarray, world)
    a, b, n, _ = _pad_rays(origins, dirs, tile)
    g = inv_dir(b)
    m = a.shape[0]

    o, d, state, orig, steps, live_count = _prologue(
        world, a, b, jnp.ones(m, dtype=jnp.int32)
    )
    st = CompactFrameState(o, d, state, orig, steps, live_count, jnp.int32(0))
    count = jnp.zeros(m, dtype=jnp.int32)

    twig_slots = int(world.twig.shape[0])
    slots, t0s, t1s, executed = [], [], [], []
    for _ in range(max_segments):
        st.executed = jnp.int32(0)
        st = compact_stages(world, st, schedule, tile, assume_resident)
        executed.append(st.executed)
        hit_o, t_o, cbm_o, csz_o, tex_o, mat_o = _phase_decode(
            world, st.o, st.d, st.state, st.orig, assume_resident,
        )
        # the ONE compiled extraction both samplers share (segments.py
        # _extract_jit): identical rounding of the t1/cursor epilogue, so
        # every later phase resumes from bit-identical parameters
        slot, t0_seg, t1_seg, t_next, live_next = _extract_jit(
            a, b, g, hit_o, t_o, cbm_o, csz_o, tex_o, mat_o, twig_slots,
            num_materials,
        )
        (count, st.o, st.d, st.state, st.orig, st.steps,
         st.live_count) = _phase_repack(
            st.o, st.d, st.orig, st.steps, count, t_next, live_next,
        )
        slots.append(slot)
        t0s.append(t0_seg)
        t1s.append(t1_seg)

    sl = slice(0, n)
    batch = SegmentBatch(
        slot=jnp.stack(slots, axis=1)[sl],
        t0=jnp.stack(t0s, axis=1)[sl],
        t1=jnp.stack(t1s, axis=1)[sl],
        count=count[sl],
    )
    return batch, executed


__all__ = ["sample_segments_compact"]
