"""Segment sampler: the geometry half of the differentiable renderer.

Marches the same unified restart-DDA as ops/march_jnp.py but — instead of
stopping at the first solid cell — records every solid cell/texel the ray
crosses as a segment ``(param_slot, t_enter, t_exit)``, up to K per ray.
Segment endpoints depend only on *geometry* (the octree), never on the
optimizable per-voxel parameters, so the sampler runs under stop_gradient
and compositing (diff/composite.py) differentiates exactly — voxel
boundaries are where the reference's dead translucency compositor
(ParallaxAlpha.Fragment.glsl:200-353) sliced its marched media, generalized
here to NeRF-style transmittance over per-voxel density.

Performance design (the round-2 rewrite): the naive formulation is ONE
while loop carrying the growing [N, K] segment arrays — which breaks the
single-int32-carry rule and serializes every pool gather ~100x
(docs/PERF_NOTES.md "the single-carry cliff").  ``sample_segments``
instead runs K *phases*: phase k re-enters the fast single-carry march of
ops/march_jnp.py (``t_start`` resume) to find the k-th solid cell, then
reconstructs the segment OUTSIDE the loop (slot from the hit texel/
material, t_exit from one escape-distance evaluation) and restarts the
next phase just past it.  All [N, K] state lives between the loops, so
every in-loop gather stays in the vectorized regime.  Rays that run out
of solid cells go dead and cost ~nothing in the remaining phases (each
phase's while loop exits immediately once all its rays are done).

Param slot layout for a DeviceWorld with T twig-pool slots:
  * twig texel:  slot = (chunk_twig_base + twig_index) * 64 + word
  * coarse LEAF: slot = T*64 + material_id   (shared per material)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.constants import EPS, LEAF, TWIG, TWIG_SIZE, TWIG_WORDS
from ..core.geometry import enter_distance, escape_distance, inv_dir, is_inside
from ..ops.march_jnp import _descend, march
from ..world.device import DeviceWorld


@struct.dataclass
class SegmentBatch:
    slot: Any    # int32[N, K] param slot per segment (-1 = unused)
    t0: Any      # float32[N, K] segment entry distance
    t1: Any      # float32[N, K] segment exit distance
    count: Any   # int32[N] segments recorded


def num_param_slots(world: DeviceWorld, num_materials: int = 8) -> int:
    return int(world.twig.shape[0]) + num_materials


def _segment_from_hit(a, b, g, hitm, t, cell_bmin, cell_size, texel,
                      material, twig_slots, num_materials):
    """One phase's segment extraction from a first-hit record: the escape
    of the hit box (texel box inside twigs, else the cell box), the param
    slot, and the next phase's cursor.  Shared by sample_segments and the
    stage-compacted sampler (diff/segments_compact.py) so the two cannot
    drift.  Returns (slot, t0, t1w, t_next, hi) where t1w/t_next are
    zeroed/reset for non-hit rays exactly as the original phase body
    did."""
    hi = hitm.astype(jnp.int32)
    t_hit = jnp.where(hitm, t, 0.0)
    p = a + b * t_hit[:, None]
    esc = escape_distance(p, g, cell_bmin, cell_bmin + cell_size[:, None])
    t1 = t_hit + esc
    slot = jnp.where(
        hitm,
        jnp.where(
            texel >= 0,
            texel,
            twig_slots + jnp.clip(material, 0, num_materials - 1),
        ),
        -1,
    ).astype(jnp.int32)
    t_next = jnp.where(hitm, t1 + jnp.float32(EPS), 0.0)
    return slot, t_hit, jnp.where(hitm, t1, 0.0), t_next, hi


# ONE compiled executable for the extraction, shared by both samplers.
# XLA contracts `a + b*t` into an fma inside a fused program but not in
# op-by-op eager execution (measured 7e-8 rel drift on CPU — and an
# optimization_barrier does NOT stop the LLVM-level contraction), and the
# drifted t1 feeds the NEXT phase's resume parameter, so samplers running
# the formula in different fusion contexts could structurally diverge at
# cell boundaries.  Routing every caller through this one jit makes the
# rounding identical by construction (the compact sampler calls it as a
# top-level launch; under an enclosing jit it inlines).
_extract_jit = jax.jit(_segment_from_hit, static_argnums=(9, 10))


def sample_segments(
    world: DeviceWorld,
    origins,
    dirs,
    max_segments: int = 32,
    max_steps: int = 512,
    num_materials: int = 8,
    step_budget: int | None = None,
    steps_stride: int = 16,
) -> SegmentBatch:
    """Collect up to ``max_segments`` solid segments per ray.

    Fast path: K sequential single-carry marches (see module docstring).
    Produces the same segments as ``sample_segments_ref`` (the original
    one-loop formulation, kept as the test oracle).

    Step-budget semantics (the cap case): by default each of the K phase
    marches gets a fresh ``max_steps`` loop budget, so a ray may spend up
    to K*max_steps iterations total — MORE than the one-loop oracle's
    single shared budget.  Away from the cap the two samplers are
    segment-for-segment identical (tested); at the cap they diverge.
    ``step_budget=B`` instead gives each ray ONE total budget across all
    phases, charged in ``steps_stride``-sized strides (a per-ray counter
    can't ride in the single-carry loop, so a phase consuming s steps is
    charged stride*ceil(s/stride); see ops/march_jnp.py step_budget).
    ``sample_segments_ref`` implements the identical charged-stride
    semantics, and the two agree exactly even when the budget binds
    (tests/test_diff.py test_budgeted_sampler_matches_oracle_at_cap)."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    a = jnp.asarray(origins, dtype=jnp.float32)
    b = jnp.asarray(dirs, dtype=jnp.float32)
    n = a.shape[0]
    g = inv_dir(b)
    eps = jnp.float32(EPS)
    twig_slots = world.twig.shape[0]

    slots, t0s, t1s = [], [], []
    count = jnp.zeros(n, dtype=jnp.int32)
    t_cur = None
    live = None
    remaining = (
        None
        if step_budget is None
        else jnp.full(n, step_budget, dtype=jnp.int32)
    )
    # With a budget, no phase can run past ceil(B/stride) charged stages
    # (each entered stage charges a full stride), so cap the per-phase loop
    # bound there — semantically a no-op that keeps the staged loop's HLO
    # small (stages ~ B/stride instead of max_steps/stride, per phase).
    phase_steps = max_steps
    if step_budget is not None:
        stride = max(4, (steps_stride // 4) * 4)  # march's effective stride
        phase_steps = min(
            max_steps, ((step_budget + stride - 1) // stride) * stride
        )
    for _ in range(max_segments):
        res = march(world, a, b, phase_steps, t_start=t_cur, live_start=live,
                    step_budget=remaining, steps_stride=steps_stride)
        if remaining is not None:
            remaining = remaining - res.steps
        # Escape of the hit box (texel box inside twigs, else the cell
        # box): same formula the one-loop sampler used, so t1/cursor agree
        # exactly (shared with the compacted sampler via _extract_jit —
        # the ONE compiled extraction, see its comment).
        slot, t_hit, t1w, t_next, hi = _extract_jit(
            a, b, g, res.hit, res.t, res.cell_bmin, res.cell_size,
            res.texel, res.material, twig_slots, num_materials,
        )
        slots.append(slot)
        t0s.append(t_hit)
        t1s.append(t1w)
        count = count + hi
        t_cur = t_next
        live = hi
    return SegmentBatch(
        slot=jnp.stack(slots, axis=1),
        t0=jnp.stack(t0s, axis=1),
        t1=jnp.stack(t1s, axis=1),
        count=count,
    )


# ONE module-level jit wrapper: re-wrapping jax.jit(sample_segments) per
# call makes every frame re-trace and re-compile each tile (~3.8 s/tile
# through the axon tunnel even with the persistent cache warm — measured
# 122 s/frame at 1080p K=16 before this was hoisted; tools/diag_segments.py
# localized it).  The wrapper instance owns the dispatch cache, so it must
# be created once, like shade/render.py's render_frame jit.
_sample_segments_jit = jax.jit(sample_segments, static_argnums=(3, 4, 5, 6, 7))


def sample_segments_frame(
    world: DeviceWorld,
    origins,
    dirs,
    max_segments: int = 32,
    max_steps: int = 512,
    num_materials: int = 8,
    tile: int = 65536,
    step_budget: int | None = None,
    steps_stride: int = 16,
) -> SegmentBatch:
    """Host-tiled segment sampling for big frames (the geometry analog of
    shade.render_frame): one jitted per-tile executable dispatched
    asynchronously over the ray batch, so each tile's march loops exit at
    that tile's worst ray.  Returns the same SegmentBatch as
    sample_segments, on device."""
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    if n <= tile:
        return _sample_segments_jit(
            world, o, d, max_segments, max_steps, num_materials,
            step_budget, steps_stride,
        )
    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
        )
    outs = [
        _sample_segments_jit(
            world, o[i : i + tile], d[i : i + tile], max_segments, max_steps,
            num_materials, step_budget, steps_stride)
        for i in range(0, o.shape[0], tile)
    ]
    sl = slice(0, n)
    return SegmentBatch(
        slot=jnp.concatenate([s.slot for s in outs])[sl],
        t0=jnp.concatenate([s.t0 for s in outs])[sl],
        t1=jnp.concatenate([s.t1 for s in outs])[sl],
        count=jnp.concatenate([s.count for s in outs])[sl],
    )


def sample_segments_ref(
    world: DeviceWorld,
    origins,
    dirs,
    max_segments: int = 32,
    max_steps: int = 512,
    num_materials: int = 8,
    step_budget: int | None = None,
    steps_stride: int = 16,
    _stride_unroll: int = 4,
) -> SegmentBatch:
    """The original one-while-loop sampler (multi-vector carry — runs in
    the serialized-gather regime, ~100x slower on TPU).  Kept as the
    equivalence oracle for sample_segments; do not use on the hot path.

    With ``step_budget`` set, implements exactly the fast sampler's
    charged-stride total-budget semantics (see sample_segments docstring):
    per ray, a new stride of up to ``stride`` cell visits may begin only
    while charged < budget (each begun stride charges ``stride``), strides
    restart at every recorded segment (phase boundary), and a phase is
    additionally capped at ceil(max_steps/stride)*stride visits.  Without
    it, the legacy single shared ``max_steps`` loop bound applies."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    a = jnp.asarray(origins, dtype=jnp.float32)
    b = jnp.asarray(dirs, dtype=jnp.float32)
    n = a.shape[0]
    K = max_segments
    g = inv_dir(b)

    cs = jnp.float32(world.chunksize)
    w, h, d = world.dims
    grid = jnp.asarray([w, h, d], dtype=jnp.float32)
    lo = world.chunkcoordmin * cs
    hi = lo + grid * cs
    twig_slots = world.twig.shape[0]

    tn, enter_ok = enter_distance(a, g, lo, hi)
    inside0 = is_inside(a, lo, hi)
    t0_ = jnp.where(inside0, jnp.float32(0.0), tn + jnp.float32(EPS))
    active0 = inside0 | enter_ok

    budgeted = step_budget is not None
    # Mirror the fast path's effective stride (ops/march_jnp.py rounds the
    # stride to a multiple of its loop unroll factor).
    stride = max(
        _stride_unroll, (steps_stride // _stride_unroll) * _stride_unroll
    )
    phase_cap = ((max_steps + stride - 1) // stride) * stride

    state = dict(
        t=t0_,
        active=active0,
        slot=jnp.full((n, K), -1, dtype=jnp.int32),
        seg_t0=jnp.zeros((n, K), dtype=jnp.float32),
        seg_t1=jnp.zeros((n, K), dtype=jnp.float32),
        count=jnp.zeros(n, dtype=jnp.int32),
        step=jnp.int32(0),
        psteps=jnp.zeros(n, dtype=jnp.int32),   # visits since last segment
        spent=jnp.zeros(n, dtype=jnp.int32),    # stride-charged budget used
    )

    wi, hci, di = jnp.int32(w), jnp.int32(h), jnp.int32(d)
    rows = jnp.arange(n)
    loop_bound = (step_budget + stride) if budgeted else max_steps

    def cond(s):
        return (s["step"] < loop_bound) & jnp.any(s["active"])

    def body(s):
        t, active = s["t"], s["active"]
        psteps, spent = s["psteps"], s["spent"]
        if budgeted:
            # Stride boundary (incl. phase start): a ray may begin a new
            # stride of visits only while charged < budget AND under the
            # per-phase cap; beginning one charges the full stride.  This
            # mirrors ops/march_jnp.py's stage-boundary accounting exactly.
            boundary = (psteps % stride) == 0
            stop = active & boundary & (
                (spent >= step_budget) | (psteps >= phase_cap)
            )
            active = active & ~stop
            spent = spent + jnp.where(
                active & boundary, jnp.int32(stride), 0
            )
        p = a + b * t[:, None]

        in_world = is_inside(p, lo, hi)
        active = active & in_world

        q = jnp.floor(p / cs).astype(jnp.int32)
        ci = (
            jnp.mod(q[:, 0], wi)
            + jnp.mod(q[:, 2], di) * wi
            + jnp.mod(q[:, 1], hci) * wi * di
        )
        ci = jnp.clip(ci, 0, world.num_chunks - 1)
        cbm = world.chunk_bmin  # per-column 1D gathers (2D row gathers
        cb = jnp.stack(         # serialize on TPU; docs/PERF_NOTES.md)
            [cbm[:, 0][ci], cbm[:, 1][ci], cbm[:, 2][ci]], axis=-1
        )
        active = active & is_inside(p, cb, cb + cs)

        tree_off = world.chunk_tree[ci]
        twig_off = world.chunk_twig[ci]

        word, bmin, size = _descend(world, p, tree_off)
        ty = (word >> jnp.uint32(30)).astype(jnp.int32)
        payload = (word & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)

        leafsize = size / jnp.float32(TWIG_SIZE)
        toff = jnp.clip(
            ((p - bmin) / leafsize[:, None]).astype(jnp.int32), 0, TWIG_SIZE - 1
        )
        tword = (
            toff[:, 2] * (TWIG_SIZE * TWIG_SIZE) + toff[:, 1] * TWIG_SIZE + toff[:, 0]
        )
        twig_idx = (twig_off + payload) * TWIG_WORDS + tword
        tex_mat = world.twig[jnp.clip(twig_idx, 0, twig_slots - 1)].astype(jnp.int32)

        is_twig = ty == TWIG
        is_leaf = ty == LEAF
        solid = active & (is_leaf | (is_twig & (tex_mat != 0)))

        # Advance distance: solid/empty cell escape, or texel escape in twigs.
        texel_min = bmin + toff.astype(jnp.float32) * leafsize[:, None]
        cell_esc = escape_distance(p, g, bmin, bmin + size[:, None])
        texel_esc = escape_distance(p, g, texel_min, texel_min + leafsize[:, None])
        esc = jnp.where(is_twig, texel_esc, cell_esc)

        # Record segment for solid cells with capacity left.
        slot_id = jnp.where(
            is_twig, twig_idx, twig_slots + jnp.clip(payload, 0, num_materials - 1)
        )
        can = solid & (s["count"] < K)
        col = jnp.clip(s["count"], 0, K - 1)
        newslot = s["slot"].at[rows, col].set(
            jnp.where(can, slot_id, s["slot"][rows, col])
        )
        new_t0 = s["seg_t0"].at[rows, col].set(
            jnp.where(can, t, s["seg_t0"][rows, col])
        )
        new_t1 = s["seg_t1"].at[rows, col].set(
            jnp.where(can, t + esc, s["seg_t1"][rows, col])
        )
        count = s["count"] + can.astype(jnp.int32)

        # Rays out of capacity stop; everyone else steps past the cell.
        full = solid & (s["count"] >= K)
        # Per-ray phase-local visit counter: +1 per visit, reset to 0 when
        # a segment is recorded (= the fast sampler starting a new phase).
        psteps = jnp.where(active, jnp.where(can, 0, psteps + 1), psteps)
        return dict(
            t=jnp.where(active, t + esc + jnp.float32(EPS), t),
            active=active & ~full,
            slot=newslot,
            seg_t0=new_t0,
            seg_t1=new_t1,
            count=count,
            step=s["step"] + 1,
            psteps=psteps,
            spent=spent,
        )

    s = jax.lax.while_loop(cond, body, state)
    return SegmentBatch(slot=s["slot"], t0=s["seg_t0"], t1=s["seg_t1"], count=s["count"])


__all__ = [
    "SegmentBatch",
    "sample_segments",
    "sample_segments_frame",
    "sample_segments_ref",
    "num_param_slots",
]
