"""Vectorized octree raymarcher on XLA — all rays in lockstep.

TPU-first redesign of the reference's divergent per-pixel traversal
(shaders/Chunkmarch.glsl rootmarch/treemarch/twigmarch/descend and
src/Traverse.cpp): instead of three nested data-dependent while loops, every
ray advances through ONE bounded loop whose body
  1. locates the ray point's chunk (toroidal grid lookup),
  2. descends the chunk's octree with an unrolled gather chain,
  3. terminates on solid LEAF cells / twig texels, or skips the empty
     cell/texel by its slab escape distance.
Twig texel stepping is unified into the outer loop — on a lockstep vector
machine uniform iterations beat specialized inner loops.  Finished rays are
masked; the loop ends when all rays are done or the step budget is spent.

Performance design (measured on TPU v5e):
  * THE SINGLE-CARRY RULE (the big one, ~1000x): XLA:TPU emits the pool
    gathers as fast vectorized VMEM gathers (~0.05-0.1 us per 8192-wide
    gather) ONLY when the while loop carries exactly one int32 vector
    (plus scalars).  Any second vector carry — even one untouched f32
    array — flips every gather in the body to a serialized ~8 ns/element
    emission (~60-90 us per gather op, measured 2026-08-18; see
    docs/PERF_NOTES.md "the single-carry cliff").  The march therefore
    packs its whole per-ray state into ONE int32: the bit pattern of the
    f32 ray parameter t, with the sign bit meaning "done" —
        state >= 0          : live, marching at t = f32(state)
        state <  0, != MISS : hit, at t = |f32(state)|  (-0.0 = hit at 0)
        state == MISS(-1e30): dead, no hit (never entered / exited world)
    The steps AOV cannot fit; ``steps_aov=True`` switches to the
    multi-carry loop (identical t/hit semantics, ~100x slower) for exact
    counts, and ``steps_aov="coarse"`` stages the fast loop to count steps
    quantized to ``steps_stride`` at ~1x cost — both mirror the
    reference's per-pixel `steps` counters (shaders/Chunkmarch.glsl:193).
  * the hit record (cell, material) is reconstructed AFTER the loop by
    one extra point-location at the frozen ray position, instead of
    being carried through every iteration;
  * masks are 0/1 int32 combined arithmetically and selects are
    lerp-style (x + m*(y-x)); XLA materializes pred[N] tensors at fusion
    boundaries with a slow (128)(4,1) bool layout, and keeping the loop
    body pred-free measured ~20x faster than jnp.where chains;
  * dead rays clamp their position parameter to T_CLAMP before the cell
    math so sentinel values (1e30) never reach the escape-distance
    arithmetic (0 * inf = NaN would poison the lerp selects);
  * the inner solid test reads the 64-bit twig *occupancy bitmask* pool
    (uint32 pairs, 32x smaller than the material pool) — materials are
    gathered once per ray after the loop;
  * march_tiled() slices the ray batch into coherent screen tiles via
    lax.map so each tile's while_loop exits at ITS worst ray, not the
    whole image's.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.constants import (
    BIGEPS,
    BRANCH,
    EPS,
    LEAF,
    MAX_STEPS,
    TWIG,
    TWIG_SIZE,
    TWIG_WORDS,
)
from ..world.device import DeviceWorld

_U30 = (1 << 30) - 1
_ABS_MASK = 0x7FFFFFFF
# Miss sentinel: the int32 bit pattern of f32(-1e30).  Finite (so masked
# arithmetic never multiplies an infinity) and far beyond any real t.
_MISS_F = float(np.float32(-1e30))
_MISS_BITS = int(np.float32(-1e30).view(np.int32))
_T_CLAMP = 1e8  # dead-ray |t| clamp before cell math (keeps escape math finite)


def _f2i(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _safe_inv(d):
    eps = jnp.float32(1e-30)
    safe = jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)
    return 1.0 / safe


@struct.dataclass
class MarchResult:
    hit: Any        # bool[N]
    t: Any          # float32[N] distance to hit (inf when miss)
    material: Any   # int32[N] material id (0 when miss)
    cell_bmin: Any  # float32[N,3] hit cell min corner
    cell_size: Any  # float32[N] hit cell edge
    steps: Any      # int32[N] traversal cost (debug AOV, reference `steps`)
    texel: Any      # int32[N] flat index into world.twig for twig-texel hits,
    #                 -1 for coarse-LEAF hits and misses (segment-slot support)


def _locate(world, px, py, pz, assume_resident: bool = False):
    """SoA point location: chunk lookup + unrolled descent.

    Returns (word, bmx, bmy, bmz, size, twig_off, in_chunk) where
    ``in_chunk`` is a 0/1 int32 mask (resident chunk covers the point).
    ``assume_resident=True`` skips the 3 chunk_bmin residency gathers per
    step — valid for a static (non-streaming) world whose chunk table
    exactly covers [chunkcoordmin, chunkcoordmin + dims) (every generated
    world before a shift()); ~20% fewer in-loop gathers."""
    tree = world.tree
    cs = jnp.float32(world.chunksize)
    w, h, d = world.dims
    n = px.shape[0]

    qx = jnp.floor(px / cs)
    qy = jnp.floor(py / cs)
    qz = jnp.floor(pz / cs)
    ci = (
        jnp.mod(qx.astype(jnp.int32), w)
        + jnp.mod(qz.astype(jnp.int32), d) * w
        + jnp.mod(qy.astype(jnp.int32), h) * (w * d)
    )
    ci = jnp.clip(ci, 0, w * h * d - 1)
    if assume_resident:
        in_chunk = jnp.ones((n,), dtype=jnp.int32)
    else:
        # Stored chunk must cover the query cell (it may not, mid-stream).
        cb = world.chunk_bmin
        cbx, cby, cbz = cb[:, 0], cb[:, 1], cb[:, 2]
        in_chunk = (
            (cbx[ci] == qx * cs).astype(jnp.int32)
            * (cby[ci] == qy * cs).astype(jnp.int32)
            * (cbz[ci] == qz * cs).astype(jnp.int32)
        )
    tree_off = world.chunk_tree[ci]
    twig_off = world.chunk_twig[ci]

    bmx, bmy, bmz = qx * cs, qy * cs, qz * cs
    size = jnp.full((n,), cs, dtype=jnp.float32)
    idx = jnp.zeros((n,), dtype=jnp.int32)
    word = tree[tree_off].astype(jnp.int32)
    for _ in range(world.depth):
        ty = (word >> 30) & 3
        # is_branch as arithmetic 0/1 (BRANCH == 0b10): bit1 * !bit0
        mb = ((ty >> 1) & 1) * (1 - (ty & 1))
        mbf = mb.astype(jnp.float32)
        payload = word & _U30
        half = size * 0.5
        gex = (px >= bmx + half).astype(jnp.int32)
        gey = (py >= bmy + half).astype(jnp.int32)
        gez = (pz >= bmz + half).astype(jnp.int32)
        child = payload + gex + 2 * gey + 4 * gez
        idx = idx + mb * (child - idx)
        bmx = bmx + mbf * gex.astype(jnp.float32) * half
        bmy = bmy + mbf * gey.astype(jnp.float32) * half
        bmz = bmz + mbf * gez.astype(jnp.float32) * half
        size = size - mbf * half
        nxt = tree[tree_off + idx].astype(jnp.int32)
        word = word + mb * (nxt - word)
    return word, bmx, bmy, bmz, size, twig_off, in_chunk


def _pack_state(t0, live0):
    """Pack (t parameter, 0/1 liveness) into the single-int32 march state
    (module docstring): the bit pattern of f32 t with the sign bit meaning
    "done"; dead rays get the MISS sentinel.  t0 is clamped to _T_CLAMP so
    every later state transition stays bit-exact (degenerate slab entries
    can produce t0 ~ 1e32, where the miss-sentinel lerp is no longer exact:
    ulp(1e32) > |miss|; in-loop t growth is self-limited)."""
    t0bits = _f2i(jnp.minimum(t0, jnp.float32(_T_CLAMP))) & _ABS_MASK
    return t0bits + (1 - live0) * (jnp.int32(_MISS_BITS) - t0bits)


def _entry_t_live(world, o, d, live_start=None):
    """World-entry slab test -> (t0 f32[N], live0 0/1 int32[N]): advance
    rays starting outside the world to its surface, kill rays that never
    enter.  This IS march()'s entry computation (factored so the
    stage-compacted schedule in ops/march_compact.py cannot drift from
    it)."""
    ax, ay, az = o[:, 0], o[:, 1], o[:, 2]
    bx, by, bz = d[:, 0], d[:, 1], d[:, 2]
    gx, gy, gz = _safe_inv(bx), _safe_inv(by), _safe_inv(bz)
    cs = jnp.float32(world.chunksize)
    w, h, dd = world.dims
    lox = world.chunkcoordmin[0] * cs
    loy = world.chunkcoordmin[1] * cs
    loz = world.chunkcoordmin[2] * cs
    hix, hiy, hiz = lox + w * cs, loy + h * cs, loz + dd * cs
    eps = jnp.float32(EPS)

    t1x = jnp.minimum((lox - ax) * gx, (hix - ax) * gx)
    t2x = jnp.maximum((lox - ax) * gx, (hix - ax) * gx)
    t1y = jnp.minimum((loy - ay) * gy, (hiy - ay) * gy)
    t2y = jnp.maximum((loy - ay) * gy, (hiy - ay) * gy)
    t1z = jnp.minimum((loz - az) * gz, (hiz - az) * gz)
    t2z = jnp.maximum((loz - az) * gz, (hiz - az) * gz)
    tnear = jnp.maximum(t1x, jnp.maximum(t1y, t1z))
    tfar = jnp.minimum(t2x, jnp.minimum(t2y, t2z))
    inside0 = (
        (ax >= lox).astype(jnp.int32) * (ax <= hix).astype(jnp.int32)
        * (ay >= loy).astype(jnp.int32) * (ay <= hiy).astype(jnp.int32)
        * (az >= loz).astype(jnp.int32) * (az <= hiz).astype(jnp.int32)
    )
    enter_ok = ((tfar > tnear) & (tnear > 0)).astype(jnp.int32)
    t0 = (1.0 - inside0.astype(jnp.float32)) * (tnear + eps)
    live0 = jnp.clip(inside0 + enter_ok, 0, 1)
    if live_start is not None:
        # Caller-masked rays (e.g. shadow rays for miss pixels) start
        # dead and cost zero loop iterations.
        live0 = live0 * jnp.asarray(live_start).astype(jnp.int32)
    return t0, live0


def entry_state(world: DeviceWorld, origins, dirs, live_start=None):
    """Packed single-int32 march state at the world entry (slab test +
    liveness), bit-identical to how march() starts its fast loop."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    t0, live0 = _entry_t_live(world, o, d, live_start)
    return _pack_state(t0, live0)


def resume_state(t_start, live_start=None):
    """Packed march state resuming at parameter ``t_start`` with 0/1
    liveness ``live_start`` — bit-identical to march(t_start=..)'s start."""
    t0 = jnp.maximum(jnp.asarray(t_start, dtype=jnp.float32), 0.0)
    live0 = (
        jnp.ones(t0.shape[0], dtype=jnp.int32)
        if live_start is None
        else jnp.asarray(live_start).astype(jnp.int32)
    )
    return _pack_state(t0, live0)


def _march_env(world, o, d, assume_resident):
    """Closures of the march loop body over one ray batch — the cell/texel
    classification, the escape advance, and the single-carry state step.
    Shared by march() and run_fast_loop() (formulas unchanged since the
    round-1 kernel; see the module docstring for the measured design)."""
    ax, ay, az = o[:, 0], o[:, 1], o[:, 2]
    bx, by, bz = d[:, 0], d[:, 1], d[:, 2]
    gx, gy, gz = _safe_inv(bx), _safe_inv(by), _safe_inv(bz)

    twig_occ = world.twig_occ
    cs = jnp.float32(world.chunksize)
    w, h, d_ = world.dims
    lox = world.chunkcoordmin[0] * cs
    loy = world.chunkcoordmin[1] * cs
    loz = world.chunkcoordmin[2] * cs
    hix, hiy, hiz = lox + w * cs, loy + h * cs, loz + d_ * cs
    eps = jnp.float32(EPS)
    bigeps = jnp.float32(BIGEPS)
    occ_cap = twig_occ.shape[0]
    inv_twig = jnp.float32(1.0 / TWIG_SIZE)

    def solid_probe(word, bmx, bmy, bmz, size, twig_off, px, py, pz):
        """Shared cell/texel classification.  Returns SoA pieces:
        (m_hitcell 0/1, ex, ey, ez, esize) where (ex..) is the escape box
        (texel box inside twigs, else the cell box)."""
        ty = (word >> 30) & 3
        m_leaf = (ty & 1) * (1 - ((ty >> 1) & 1))          # 0b01
        m_twig = (ty & 1) * ((ty >> 1) & 1)                # 0b11
        payload = word & _U30

        leafsize = size * inv_twig
        inv_ls = 1.0 / leafsize
        tox = jnp.clip(((px - bmx) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        toy = jnp.clip(((py - bmy) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        toz = jnp.clip(((pz - bmz) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        tword = toz * (TWIG_SIZE * TWIG_SIZE) + toy * TWIG_SIZE + tox
        occ_word = twig_occ[
            jnp.clip((twig_off + payload) * 2 + (tword >> 5), 0, occ_cap - 1)
        ].astype(jnp.int32)
        tex_solid = (occ_word >> (tword & 31)) & 1

        m_hitcell = jnp.clip(m_leaf + m_twig * tex_solid, 0, 1)

        mtf = m_twig.astype(jnp.float32)
        ex = bmx + mtf * (tox.astype(jnp.float32) * leafsize)
        ey = bmy + mtf * (toy.astype(jnp.float32) * leafsize)
        ez = bmz + mtf * (toz.astype(jnp.float32) * leafsize)
        esize = size + mtf * (leafsize - size)
        return m_hitcell, ex, ey, ez, esize

    def classify_and_escape(t, live):
        """One march step's shared geometry: returns (hit_now, dead_now,
        esc) for rays at parameter ``t`` with 0/1 ``live`` masks."""
        px, py, pz = ax + bx * t, ay + by * t, az + bz * t

        in_world = (
            (px >= lox).astype(jnp.int32) * (px <= hix).astype(jnp.int32)
            * (py >= loy).astype(jnp.int32) * (py <= hiy).astype(jnp.int32)
            * (pz >= loz).astype(jnp.int32) * (pz <= hiz).astype(jnp.int32)
        )
        word, bmx, bmy, bmz, size, twig_off, in_chunk = _locate(
            world, px, py, pz, assume_resident
        )
        resident = in_world * in_chunk
        live_eff = live * resident

        m_hitcell, ex, ey, ez, esize = solid_probe(
            word, bmx, bmy, bmz, size, twig_off, px, py, pz
        )
        hit_now = live_eff * m_hitcell
        dead_now = live * (1 - resident)

        # --- advance: escape the (cell | texel) box ------------------------
        dx = jnp.maximum((ex - px) * gx, (ex + esize - px) * gx)
        dy = jnp.maximum((ey - py) * gy, (ey + esize - py) * gy)
        dz = jnp.maximum((ez - pz) * gz, (ez + esize - pz) * gz)
        esc = jnp.minimum(dx, jnp.minimum(dy, dz))
        small = (esc < eps).astype(jnp.float32)
        esc = esc + small * (bigeps - esc) + eps
        return hit_now, dead_now, esc

    miss_b = jnp.int32(_MISS_BITS)
    t_clamp = jnp.float32(_T_CLAMP)

    def step_state(state):
        live = 1 - ((state >> 31) & 1)          # sign bit clear = live
        t = jnp.minimum(_i2f(state & _ABS_MASK), t_clamp)
        hit_now, dead_now, esc = classify_and_escape(t, live)
        adv = live * (1 - hit_now) * (1 - dead_now)
        # Select the next state in INT space: modular arithmetic makes
        # x + m*(y-x) exact for 0/1 m even across int32 wraparound, and
        # "hit" is just the sign bit (state | 0x80000000 keeps -0.0 for
        # hits at t=0, which a float lerp would round away to +0.0).
        cand = _f2i(t + esc)
        hitb = state | jnp.int32(~_ABS_MASK)   # set sign bit (= -t, exact)
        return (
            state
            + adv * (cand - state)
            + hit_now * (hitb - state)
            + dead_now * (miss_b - state)
        )

    return classify_and_escape, step_state


def _run_loop(step_state, state0, max_steps, unroll):
    """The single-carry while loop: advance packed states until every ray
    is done or ``max_steps`` iterations ran (rounded up to the unroll).
    Returns (state, iters) where ``iters`` is the scalar iteration count
    actually executed (a multiple of ``unroll``) — the per-tile lockstep
    lane cost the compact schedule's accounting sums."""

    def cond(s):
        state, step = s
        # any live ray has its sign bit clear => int32 max >= 0
        return (step < max_steps) & (jnp.max(state) >= 0)

    def body(s):
        state, step = s
        for _ in range(unroll):
            state = step_state(state)
        return (state, step + unroll)

    return jax.lax.while_loop(cond, body, (state0, jnp.int32(0)))


def run_fast_loop(
    world: DeviceWorld,
    origins,
    dirs,
    state0,
    max_steps: int,
    unroll: int = 4,
    assume_resident: bool = False,
):
    """Advance packed march states (entry_state/resume_state) by up to
    ``max_steps`` loop iterations.  Returns (state, iters).  Composing
    stages of this loop is bit-identical to one longer march as long as
    every stage bound is a multiple of ``unroll`` (the staged-resume
    mechanism of ops/march_compact.py and the coarse steps AOV)."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    _, step_state = _march_env(world, o, d, assume_resident)
    return _run_loop(step_state, state0, max_steps, unroll)


def _hit_record(world, o, d, hit, t, assume_resident, still_live, steps):
    """Post-loop hit-record reconstruction at the frozen ray position
    (march() module docstring item 2): one extra point-location instead of
    carrying the record through the loop.  ``still_live`` (bool[N] or
    None) is the _expose_live_t resume support — live-at-cap rays report
    their current parameter instead of inf."""
    ax, ay, az = o[:, 0], o[:, 1], o[:, 2]
    bx, by, bz = d[:, 0], d[:, 1], d[:, 2]
    inv_twig = jnp.float32(1.0 / TWIG_SIZE)

    px, py, pz = ax + bx * t, ay + by * t, az + bz * t
    word, bmx, bmy, bmz, size, twig_off, _ = _locate(
        world, px, py, pz, assume_resident
    )
    ty = (word >> 30) & 3
    m_leaf = (ty & 1) * (1 - ((ty >> 1) & 1))
    payload = word & _U30

    leafsize = size * inv_twig
    inv_ls = 1.0 / leafsize
    tox = jnp.clip(((px - bmx) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
    toy = jnp.clip(((py - bmy) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
    toz = jnp.clip(((pz - bmz) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
    tword = toz * (TWIG_SIZE * TWIG_SIZE) + toy * TWIG_SIZE + tox
    twig_idx = (twig_off + payload) * TWIG_WORDS + tword
    tex_mat = world.twig[
        jnp.clip(twig_idx, 0, world.twig.shape[0] - 1)
    ].astype(jnp.int32)
    material = m_leaf * payload + (1 - m_leaf) * tex_mat

    mlf = m_leaf.astype(jnp.float32)
    hbx = bmx + (1.0 - mlf) * (tox.astype(jnp.float32) * leafsize)
    hby = bmy + (1.0 - mlf) * (toy.astype(jnp.float32) * leafsize)
    hbz = bmz + (1.0 - mlf) * (toz.astype(jnp.float32) * leafsize)
    hsize = size + (1.0 - mlf) * (leafsize - size)

    twig_idx_c = jnp.clip(twig_idx, 0, world.twig.shape[0] - 1)
    if still_live is not None:
        t_ret = jnp.where(hit | still_live, t, jnp.float32(jnp.inf))
    else:
        t_ret = jnp.where(hit, t, jnp.float32(jnp.inf))
    return MarchResult(
        hit=hit,
        t=t_ret,
        material=jnp.where(hit, material, 0),
        cell_bmin=jnp.stack(
            [
                jnp.where(hit, hbx, 0.0),
                jnp.where(hit, hby, 0.0),
                jnp.where(hit, hbz, 0.0),
            ],
            axis=-1,
        ),
        cell_size=jnp.where(hit, hsize, 0.0),
        steps=steps,
        texel=jnp.where(hit & (m_leaf == 0), twig_idx_c, -1),
    )


def reconstruct(
    world: DeviceWorld,
    origins,
    dirs,
    state,
    assume_resident: bool = False,
    expose_live_t: bool = False,
    steps=None,
) -> MarchResult:
    """Decode a packed march state into the MarchResult march() would
    return for it: hit/t from the state bits, then the post-loop
    hit-record reconstruction.  ``expose_live_t=True`` makes live-at-cap
    rays report their resume parameter (see march _expose_live_t)."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    miss_b = jnp.int32(_MISS_BITS)
    neg = (state >> 31) & 1
    hit = (neg == 1) & (state != miss_b)
    t = _i2f(state & _ABS_MASK)
    still_live = (neg == 0) if expose_live_t else None
    s_steps = jnp.zeros(state.shape[0], dtype=jnp.int32) if steps is None else steps
    return _hit_record(world, o, d, hit, t, assume_resident, still_live, s_steps)


def march(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    unroll: int = 4,
    steps_aov=False,
    t_start=None,
    live_start=None,
    steps_stride: int = 16,
    assume_resident: bool = False,
    step_budget=None,
    _check_const_pools: bool = True,
    _expose_live_t: bool = False,
) -> MarchResult:
    """March N rays; returns a MarchResult of arrays over the ray batch.

    ``steps_aov=False`` (default) runs the single-int32-carry loop (fast
    path, see module docstring) and returns ``steps`` as zeros;
    ``steps_aov=True`` runs the multi-carry loop that counts per-ray
    traversal steps exactly (the reference's `steps` debug counter) at
    ~100x the cost; ``steps_aov="coarse"`` keeps the fast loop and counts
    steps quantized up to ``steps_stride`` at ~1x cost (bounds:
    true_steps <= steps <= true_steps + steps_stride).  All three produce
    bit-identical hit/t/material results.

    ``t_start``/``live_start`` resume a march mid-ray: when given, the
    world-entry slab test is skipped and ray i starts at parameter
    ``t_start[i]`` with 0/1 liveness ``live_start[i]`` (dead rays report a
    miss immediately).  This is how the segment sampler re-marches past
    each recorded solid cell (diff/segments.py) at fast-loop speed.

    ``step_budget`` (int32[N], optional) gives each ray a per-ray loop-
    iteration budget on top of the scalar ``max_steps`` bound.  A per-ray
    counter cannot live in the fast loop (single-carry rule), so the
    budget is charged in full strides at stage boundaries of the staged
    fast loop: a ray may enter a stage iff charged < budget, and each
    entered stage charges ``stride = steps_stride`` (rounded to a
    multiple of ``unroll``) regardless of where in the stage the ray
    finishes.  A ray's total charge is therefore exactly
    ``stride * ceil(exact_steps / stride)`` — batch-independent — and is
    returned in ``.steps``.  Rays whose budget runs out report a miss.
    The segment sampler threads these charges across its K phases to give
    the whole ray ONE total budget matching the one-loop oracle's
    semantics (diff/segments.py step_budget)."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    o = jnp.asarray(origins, dtype=jnp.float32)
    if (
        _check_const_pools
        and isinstance(o, jax.core.Tracer)
        and not isinstance(jnp.asarray(world.tree), jax.core.Tracer)
    ):
        import warnings

        warnings.warn(
            "march(): the world pools are closure constants of this jit "
            "trace; pass the DeviceWorld through the jitted function's "
            "arguments instead — constant pools compile to serialized "
            "gathers, ~300x slower (docs/PERF_NOTES.md).",
            stacklevel=2,
        )
    dd = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]

    if t_start is None:
        t0, live0 = _entry_t_live(world, o, dd, live_start)
    else:
        # --- resume: caller supplies the start parameter and liveness -------
        t0 = jnp.maximum(jnp.asarray(t_start, dtype=jnp.float32), 0.0)
        live0 = (
            jnp.ones(n, dtype=jnp.int32)
            if live_start is None
            else jnp.asarray(live_start).astype(jnp.int32)
        )

    classify_and_escape, step_state = _march_env(world, o, dd, assume_resident)

    if steps_aov is True:
        # ---------------- multi-carry debug loop (steps counter) -----------
        def step_once(s):
            t, live = s["t"], s["live"]
            hit_now, dead_now, esc = classify_and_escape(t, live)
            adv = live * (1 - hit_now) * (1 - dead_now)
            return dict(
                t=t + adv.astype(jnp.float32) * esc,
                live=adv,
                hit=s["hit"] + hit_now,
                steps=s["steps"] + live * (1 - dead_now),
                step=s["step"],
            )

        state = dict(
            t=t0,
            live=live0,
            hit=jnp.zeros(n, dtype=jnp.int32),
            steps=jnp.zeros(n, dtype=jnp.int32),
            step=jnp.int32(0),
        )

        def cond(s):
            return (s["step"] < max_steps) & (jnp.max(s["live"]) > 0)

        def body(s):
            for _ in range(unroll):
                s = step_once(s)
            s["step"] = s["step"] + unroll
            return s

        s = jax.lax.while_loop(cond, body, state)
        hit = s["hit"] > 0
        t = s["t"]
        s_steps = s["steps"]
    else:
        # ---------------- single-int32-carry fast loop ----------------------
        miss_b = jnp.int32(_MISS_BITS)

        # t0 is semantically >= 0 for live rays but can be -0.0 (the
        # (1-inside)*(tnear+eps) product with tnear < 0 for inside rays);
        # _pack_state clears the sign bit so it doesn't read as "done",
        # and clamps (see its docstring).
        state0 = _pack_state(t0, live0)

        if step_budget is not None:
            # Per-ray budget, charged stride-at-a-time at stage boundaries
            # (see docstring).  Charges are batch-independent: stage
            # boundaries fall at fixed multiples of ``stride`` iterations
            # (a stage only ends early when EVERY ray is done), so ray r
            # is charged exactly stride * ceil(exact_steps_r / stride).
            stride = max(unroll, (steps_stride // unroll) * unroll)
            stages = (max_steps + stride - 1) // stride
            budget = jnp.asarray(step_budget, dtype=jnp.int32)
            charged = jnp.zeros(n, dtype=jnp.int32)
            state = state0
            for _ in range(stages):
                live_before = 1 - ((state >> 31) & 1)
                # Out of budget => the ray ends as a MISS before the stage.
                no_budget = live_before * (charged >= budget).astype(jnp.int32)
                state = state + no_budget * (miss_b - state)
                entered = live_before * (1 - no_budget)

                state, _k = _run_loop(step_state, state, stride, unroll)
                charged = charged + entered * stride
            s_steps = charged
        elif steps_aov == "coarse":
            # Staged fast loop: run the SAME single-carry loop in stages of
            # ``steps_stride`` iterations and, between stages (outside any
            # while loop, so the carry rule is untouched), accumulate
            # live_mask * stage_trip_count.  Gives a per-ray step count
            # quantized up to the stride at ~1x fast-path cost — the cheap
            # profiling mode VERDICT r1 asked for (vs the exact multi-carry
            # counter's ~100x).  A ray's true steps s satisfies
            # est - stride <= s <= est (est = the returned value).
            stride = max(unroll, (steps_stride // unroll) * unroll)
            stages = (max_steps + stride - 1) // stride
            s_steps = jnp.zeros(n, dtype=jnp.int32)
            state = state0
            for _ in range(stages):
                live_before = 1 - ((state >> 31) & 1)
                state, k = _run_loop(step_state, state, stride, unroll)
                s_steps = s_steps + live_before * k
        else:
            state, _ = _run_loop(step_state, state0, max_steps, unroll)
            s_steps = jnp.zeros(n, dtype=jnp.int32)
        neg = (state >> 31) & 1
        hit = (neg == 1) & (state != miss_b)
        t = _i2f(state & _ABS_MASK)

    # --- post-loop: reconstruct the hit record at the frozen position ------
    if _expose_live_t:
        # Stage-resume support (ops/march_compact.py): rays still LIVE at
        # the step cap report their current parameter instead of inf, so a
        # later march(t_start=...) resumes them bit-exactly.  Dead rays
        # (miss sentinel / never-live) still report inf.  Fast path only —
        # the multi-carry debug loop doesn't expose its live mask here.
        if steps_aov is True:
            raise ValueError("_expose_live_t requires the fast-path loop")
        still_live = ((state >> 31) & 1) == 0
    else:
        still_live = None
    return _hit_record(world, o, dd, hit, t, assume_resident, still_live,
                       s_steps)


def march_tiled(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    tile: int = 8192,
    unroll: int = 4,
    steps_aov=False,
    live_start=None,
    steps_stride: int = 16,
    assume_resident: bool = False,
) -> MarchResult:
    """March in coherent screen tiles: each tile's loop exits at its own
    worst ray.  Rays are padded to a tile multiple with away-pointing rays.
    ``live_start`` (0/1[N]) pre-kills rays (they report a miss at no cost).

    EAGER big batches auto-delegate to march_frame (identical results:
    same per-tile march, same order): calling this eagerly would put the
    concrete pools into the lax.map closure as baked-in CONSTANTS — the
    serialized-gather regime, and through the axon tunnel executing any
    constant-pool executable permanently poisons process dispatch
    (VERDICT r3 weak #7; docs/PERF_NOTES.md round-3 bisect)."""
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    if n <= tile:
        return march(world, o, d, max_steps, unroll, steps_aov,
                     live_start=live_start, steps_stride=steps_stride,
                     assume_resident=assume_resident)
    if (
        not isinstance(world.tree, jax.core.Tracer)
        and steps_aov is False
        and unroll == 4
    ):
        return march_frame(world, o, d, max_steps, tile=tile,
                           assume_resident=assume_resident,
                           live_start=live_start)
    pad = (-n) % tile
    ls = None
    if live_start is not None:
        ls = jnp.asarray(live_start).astype(jnp.int32)
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
        )
        if ls is not None:
            ls = jnp.concatenate([ls, jnp.zeros(pad, dtype=jnp.int32)])
    ot = o.reshape(-1, tile, 3)
    dt = d.reshape(-1, tile, 3)

    if ls is None:
        def one(ab):
            # _check_const_pools=False: lax.map traces this body with ray
            # tracers over a (legitimately) concrete world — the warning
            # would false-positive on the intended eager path (ADVICE r1).
            r = march(world, ab[0], ab[1], max_steps, unroll, steps_aov,
                      steps_stride=steps_stride,
                      assume_resident=assume_resident,
                      _check_const_pools=False)
            return (r.hit, r.t, r.material, r.cell_bmin, r.cell_size, r.steps,
                    r.texel)

        mapped = jax.lax.map(one, (ot, dt))
    else:
        lt = ls.reshape(-1, tile)

        def one(ab):
            r = march(world, ab[0], ab[1], max_steps, unroll, steps_aov,
                      live_start=ab[2], steps_stride=steps_stride,
                      assume_resident=assume_resident,
                      _check_const_pools=False)
            return (r.hit, r.t, r.material, r.cell_bmin, r.cell_size, r.steps,
                    r.texel)

        mapped = jax.lax.map(one, (ot, dt, lt))
    hit, t, mat, cbm, csz, steps, texel = mapped
    sl = slice(0, n)
    return MarchResult(
        hit=hit.reshape(-1)[sl],
        t=t.reshape(-1)[sl],
        material=mat.reshape(-1)[sl],
        cell_bmin=cbm.reshape(-1, 3)[sl],
        cell_size=csz.reshape(-1)[sl],
        steps=steps.reshape(-1)[sl],
        texel=texel.reshape(-1)[sl],
    )


@functools.partial(
    jax.jit, static_argnames=("max_steps", "assume_resident")
)
def _march_tile_jit(world, o, d, max_steps, assume_resident, live_start=None):
    return march(world, o, d, max_steps, assume_resident=assume_resident,
                 live_start=live_start, _check_const_pools=False)


def march_frame(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    tile: int = 65536,
    assume_resident: bool = False,
    live_start=None,
) -> MarchResult:
    """Host-tiled full-frame march: ONE jitted per-tile executable (the
    world travels as a jit ARGUMENT) dispatched asynchronously over the ray
    batch — the march analog of shade.render_frame, for eager big-batch
    marches outside any enclosing jit (e.g. the shadow-map light pass).

    Use this instead of march_tiled when calling eagerly: march_tiled's
    lax.map would trace its tile body with the concrete pools captured as
    closure CONSTANTS — the serialized-gather regime, and through the axon
    tunnel executing any constant-pool executable poisons the whole
    process's dispatch (docs/PERF_NOTES.md, round-3 bisect)."""
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    ls = None
    if live_start is not None:
        ls = jnp.asarray(live_start).astype(jnp.int32)
    if n <= tile:
        return _march_tile_jit(world, o, d, max_steps, assume_resident, ls)
    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                                 (pad, 3))]
        )
        if ls is not None:
            ls = jnp.concatenate([ls, jnp.zeros(pad, dtype=jnp.int32)])
    outs = [
        _march_tile_jit(world, o[i:i + tile], d[i:i + tile], max_steps,
                        assume_resident,
                        None if ls is None else ls[i:i + tile])
        for i in range(0, o.shape[0], tile)
    ]
    sl = slice(0, n)
    return MarchResult(
        hit=jnp.concatenate([r.hit for r in outs])[sl],
        t=jnp.concatenate([r.t for r in outs])[sl],
        material=jnp.concatenate([r.material for r in outs])[sl],
        cell_bmin=jnp.concatenate([r.cell_bmin for r in outs])[sl],
        cell_size=jnp.concatenate([r.cell_size for r in outs])[sl],
        steps=jnp.concatenate([r.steps for r in outs])[sl],
        texel=jnp.concatenate([r.texel for r in outs])[sl],
    )


def _descend(world: DeviceWorld, p, tree_off):
    """Fixed-depth point location (used by the segment sampler):
    returns (node_word, cell_bmin, cell_size)."""
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    n = px.shape[0]
    cs = jnp.float32(world.chunksize)
    tree = world.tree

    bmx = jnp.floor(px / cs) * cs
    bmy = jnp.floor(py / cs) * cs
    bmz = jnp.floor(pz / cs) * cs
    size = jnp.full((n,), cs, dtype=jnp.float32)
    idx = jnp.zeros((n,), dtype=jnp.int32)
    word = tree[tree_off].astype(jnp.int32)
    for _ in range(world.depth):
        ty = (word >> 30) & 3
        mb = ((ty >> 1) & 1) * (1 - (ty & 1))
        mbf = mb.astype(jnp.float32)
        payload = word & _U30
        half = size * 0.5
        gex = (px >= bmx + half).astype(jnp.int32)
        gey = (py >= bmy + half).astype(jnp.int32)
        gez = (pz >= bmz + half).astype(jnp.int32)
        child = payload + gex + 2 * gey + 4 * gez
        idx = idx + mb * (child - idx)
        bmx = bmx + mbf * gex.astype(jnp.float32) * half
        bmy = bmy + mbf * gey.astype(jnp.float32) * half
        bmz = bmz + mbf * gez.astype(jnp.float32) * half
        size = size - mbf * half
        nxt = tree[tree_off + idx].astype(jnp.int32)
        word = word + mb * (nxt - word)
    word_u = word.astype(jnp.uint32)
    return word_u, jnp.stack([bmx, bmy, bmz], axis=-1), size


__all__ = [
    "march",
    "march_tiled",
    "march_frame",
    "MarchResult",
    "entry_state",
    "resume_state",
    "run_fast_loop",
    "reconstruct",
]
