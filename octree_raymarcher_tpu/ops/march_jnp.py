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
  * structure-of-arrays state — scalar (N,) carries only, no (N,3) ops in
    the hot loop (lane-padding-free);
  * the inner solid test reads the 64-bit twig *occupancy bitmask* pool
    (uint32 pairs, 32x smaller than the material pool) — materials are
    gathered once per ray after the loop;
  * node pool stays uint32 (uint32-table gathers hit XLA's fast path);
  * the descent is unrolled python-side, and ``unroll`` whole march steps
    run per while_loop iteration to amortize loop overhead;
  * march_tiled() slices the ray batch into coherent screen tiles via
    lax.map so each tile's while_loop exits at ITS worst ray, not the
    whole image's.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
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

_U30 = jnp.uint32((1 << 30) - 1)


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


def march(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    unroll: int = 4,
) -> MarchResult:
    """March N rays; returns a MarchResult of arrays over the ray batch."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    o = jnp.asarray(origins, dtype=jnp.float32)
    dd = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]

    ax, ay, az = o[:, 0], o[:, 1], o[:, 2]
    bx, by, bz = dd[:, 0], dd[:, 1], dd[:, 2]
    gx, gy, gz = _safe_inv(bx), _safe_inv(by), _safe_inv(bz)

    tree = world.tree
    twig_occ = world.twig_occ
    cb = world.chunk_bmin
    cbx, cby, cbz = cb[:, 0], cb[:, 1], cb[:, 2]
    ctree = world.chunk_tree
    ctwig = world.chunk_twig

    cs = jnp.float32(world.chunksize)
    w, h, d = world.dims
    lox = world.chunkcoordmin[0] * cs
    loy = world.chunkcoordmin[1] * cs
    loz = world.chunkcoordmin[2] * cs
    hix, hiy, hiz = lox + w * cs, loy + h * cs, loz + d * cs
    depth = world.depth
    eps = jnp.float32(EPS)
    bigeps = jnp.float32(BIGEPS)
    occ_cap = twig_occ.shape[0]

    # --- entry: advance rays starting outside the world to its surface -----
    t1x = jnp.minimum((lox - ax) * gx, (hix - ax) * gx)
    t2x = jnp.maximum((lox - ax) * gx, (hix - ax) * gx)
    t1y = jnp.minimum((loy - ay) * gy, (hiy - ay) * gy)
    t2y = jnp.maximum((loy - ay) * gy, (hiy - ay) * gy)
    t1z = jnp.minimum((loz - az) * gz, (hiz - az) * gz)
    t2z = jnp.maximum((loz - az) * gz, (hiz - az) * gz)
    tnear = jnp.maximum(t1x, jnp.maximum(t1y, t1z))
    tfar = jnp.minimum(t2x, jnp.minimum(t2y, t2z))
    inside0 = (
        (ax >= lox) & (ax <= hix) & (ay >= loy) & (ay <= hiy) & (az >= loz) & (az <= hiz)
    )
    enter_ok = (tfar > tnear) & (tnear > 0)
    t0 = jnp.where(inside0, jnp.float32(0.0), tnear + eps)
    active0 = inside0 | enter_ok

    state = dict(
        t=t0,
        active=active0,
        hit=jnp.zeros(n, dtype=bool),
        # hit slot: >= 0 -> twig texel flat index; < 0 -> -(leaf payload + 1)
        slot=jnp.zeros(n, dtype=jnp.int32),
        hx=jnp.zeros(n, dtype=jnp.float32),
        hy=jnp.zeros(n, dtype=jnp.float32),
        hz=jnp.zeros(n, dtype=jnp.float32),
        hsize=jnp.zeros(n, dtype=jnp.float32),
        steps=jnp.zeros(n, dtype=jnp.int32),
        step=jnp.int32(0),
    )

    def step_once(s):
        t, active = s["t"], s["active"]
        px, py, pz = ax + bx * t, ay + by * t, az + bz * t

        in_world = (
            (px >= lox) & (px <= hix)
            & (py >= loy) & (py <= hiy)
            & (pz >= loz) & (pz <= hiz)
        )
        active = active & in_world

        # Toroidal chunk lookup (reference chunkIndex, Chunkmarch.glsl:156-167).
        qx = jnp.floor(px / cs)
        qy = jnp.floor(py / cs)
        qz = jnp.floor(pz / cs)
        ci = (
            jnp.mod(qx.astype(jnp.int32), w)
            + jnp.mod(qz.astype(jnp.int32), d) * w
            + jnp.mod(qy.astype(jnp.int32), h) * (w * d)
        )
        ci = jnp.clip(ci, 0, w * h * d - 1)
        # Stored chunk must cover the query cell (it may not, mid-stream).
        covers = (cbx[ci] == qx * cs) & (cby[ci] == qy * cs) & (cbz[ci] == qz * cs)
        active = active & covers
        tree_off = ctree[ci]
        twig_off = ctwig[ci]

        # --- descend: unrolled root-to-leaf point location ----------------
        bmx, bmy, bmz = qx * cs, qy * cs, qz * cs
        size = jnp.full((n,), cs, dtype=jnp.float32)
        idx = jnp.zeros((n,), dtype=jnp.int32)
        word = tree[tree_off]
        for _ in range(depth):
            is_branch = (word >> jnp.uint32(30)) == BRANCH
            payload = (word & _U30).astype(jnp.int32)
            half = size * 0.5
            gex = px >= bmx + half
            gey = py >= bmy + half
            gez = pz >= bmz + half
            child = payload + (
                gex.astype(jnp.int32)
                + 2 * gey.astype(jnp.int32)
                + 4 * gez.astype(jnp.int32)
            )
            idx = jnp.where(is_branch, child, idx)
            bmx = jnp.where(is_branch & gex, bmx + half, bmx)
            bmy = jnp.where(is_branch & gey, bmy + half, bmy)
            bmz = jnp.where(is_branch & gez, bmz + half, bmz)
            size = jnp.where(is_branch, half, size)
            word = jnp.where(is_branch, tree[tree_off + idx], word)

        ty = (word >> jnp.uint32(30)).astype(jnp.int32)
        payload = (word & _U30).astype(jnp.int32)

        # --- twig texel occupancy (1-bit) for rays in a TWIG cell ---------
        leafsize = size * jnp.float32(1.0 / TWIG_SIZE)
        inv_ls = 1.0 / leafsize
        tox = jnp.clip(((px - bmx) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        toy = jnp.clip(((py - bmy) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        toz = jnp.clip(((pz - bmz) * inv_ls).astype(jnp.int32), 0, TWIG_SIZE - 1)
        tword = toz * (TWIG_SIZE * TWIG_SIZE) + toy * TWIG_SIZE + tox
        twig_idx = (twig_off + payload) * TWIG_WORDS + tword
        occ_word = twig_occ[
            jnp.clip((twig_off + payload) * 2 + (tword >> 5), 0, occ_cap - 1)
        ]
        tex_solid = ((occ_word >> (tword & 31).astype(jnp.uint32)) & jnp.uint32(1)) != 0

        is_twig = ty == TWIG
        is_leaf = ty == LEAF
        tex_hit = is_twig & tex_solid
        hit_now = active & (is_leaf | tex_hit)

        # --- hit record ----------------------------------------------------
        texel_x = bmx + tox.astype(jnp.float32) * leafsize
        texel_y = bmy + toy.astype(jnp.float32) * leafsize
        texel_z = bmz + toz.astype(jnp.float32) * leafsize
        hit_slot = jnp.where(is_leaf, -(payload + 1), twig_idx)
        hbx = jnp.where(is_leaf, bmx, texel_x)
        hby = jnp.where(is_leaf, bmy, texel_y)
        hbz = jnp.where(is_leaf, bmz, texel_z)
        hsz = jnp.where(is_leaf, size, leafsize)

        # --- advance: escape the (cell | texel) box ------------------------
        ex = jnp.where(is_twig, texel_x, bmx)
        ey = jnp.where(is_twig, texel_y, bmy)
        ez = jnp.where(is_twig, texel_z, bmz)
        esz = jnp.where(is_twig, leafsize, size)
        dx = jnp.maximum((ex - px) * gx, (ex + esz - px) * gx)
        dy = jnp.maximum((ey - py) * gy, (ey + esz - py) * gy)
        dz = jnp.maximum((ez - pz) * gz, (ez + esz - pz) * gz)
        esc = jnp.minimum(dx, jnp.minimum(dy, dz))
        esc = jnp.where(esc < eps, bigeps, esc) + eps

        adv = active & ~hit_now
        return dict(
            t=jnp.where(adv, t + esc, t),
            active=adv,
            hit=s["hit"] | hit_now,
            slot=jnp.where(hit_now, hit_slot, s["slot"]),
            hx=jnp.where(hit_now, hbx, s["hx"]),
            hy=jnp.where(hit_now, hby, s["hy"]),
            hz=jnp.where(hit_now, hbz, s["hz"]),
            hsize=jnp.where(hit_now, hsz, s["hsize"]),
            steps=s["steps"] + active.astype(jnp.int32),
            step=s["step"],
        )

    def cond(s):
        return (s["step"] < max_steps) & jnp.any(s["active"])

    def body(s):
        for _ in range(unroll):
            s = step_once(s)
        s["step"] = s["step"] + unroll
        return s

    s = jax.lax.while_loop(cond, body, state)

    # Resolve hit materials with ONE post-loop gather from the material pool.
    slot = s["slot"]
    leaf_mat = -slot - 1
    tex_mat = world.twig[jnp.clip(slot, 0, world.twig.shape[0] - 1)].astype(jnp.int32)
    material = jnp.where(slot < 0, leaf_mat, tex_mat)
    return MarchResult(
        hit=s["hit"],
        t=jnp.where(s["hit"], s["t"], jnp.float32(jnp.inf)),
        material=jnp.where(s["hit"], material, 0),
        cell_bmin=jnp.stack([s["hx"], s["hy"], s["hz"]], axis=-1),
        cell_size=s["hsize"],
        steps=s["steps"],
    )


def march_tiled(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
    tile: int = 32768,
    unroll: int = 4,
) -> MarchResult:
    """March in coherent screen tiles: each tile's loop exits at its own
    worst ray.  Rays are padded to a tile multiple with away-pointing rays."""
    o = jnp.asarray(origins, dtype=jnp.float32)
    d = jnp.asarray(dirs, dtype=jnp.float32)
    n = o.shape[0]
    if n <= tile:
        return march(world, o, d, max_steps, unroll)
    pad = (-n) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
        )
    ot = o.reshape(-1, tile, 3)
    dt = d.reshape(-1, tile, 3)

    def one(ab):
        r = march(world, ab[0], ab[1], max_steps, unroll)
        return (r.hit, r.t, r.material, r.cell_bmin, r.cell_size, r.steps)

    hit, t, mat, cbm, csz, steps = jax.lax.map(one, (ot, dt))
    sl = slice(0, n)
    return MarchResult(
        hit=hit.reshape(-1)[sl],
        t=t.reshape(-1)[sl],
        material=mat.reshape(-1)[sl],
        cell_bmin=cbm.reshape(-1, 3)[sl],
        cell_size=csz.reshape(-1)[sl],
        steps=steps.reshape(-1)[sl],
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
    word = tree[tree_off]
    for _ in range(world.depth):
        is_branch = (word >> jnp.uint32(30)) == BRANCH
        payload = (word & _U30).astype(jnp.int32)
        half = size * 0.5
        gex = px >= bmx + half
        gey = py >= bmy + half
        gez = pz >= bmz + half
        child = payload + (
            gex.astype(jnp.int32) + 2 * gey.astype(jnp.int32) + 4 * gez.astype(jnp.int32)
        )
        idx = jnp.where(is_branch, child, idx)
        bmx = jnp.where(is_branch & gex, bmx + half, bmx)
        bmy = jnp.where(is_branch & gey, bmy + half, bmy)
        bmz = jnp.where(is_branch & gez, bmz + half, bmz)
        size = jnp.where(is_branch, half, size)
        word = jnp.where(is_branch, tree[tree_off + idx], word)
    return word, jnp.stack([bmx, bmy, bmz], axis=-1), size


__all__ = ["march", "march_tiled", "MarchResult"]
