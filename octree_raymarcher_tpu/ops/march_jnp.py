"""Vectorized octree raymarcher on XLA — all rays in lockstep.

TPU-first redesign of the reference's divergent per-pixel traversal
(shaders/Chunkmarch.glsl rootmarch/treemarch/twigmarch/descend and
src/Traverse.cpp): instead of three nested data-dependent while loops, every
ray advances through ONE bounded loop whose body
  1. locates the ray point's chunk (toroidal grid lookup),
  2. descends the chunk's octree with a fixed-depth gather chain,
  3. terminates on solid LEAF cells / twig texels, or skips the empty
     cell/texel by its slab escape distance.
Twig texel stepping is unified into the outer loop — on a lockstep vector
machine uniform iterations beat specialized inner loops.  Finished rays are
masked; the loop ends when all rays are done or the step budget is spent.

The loop is a lax.while_loop (forward render path; the differentiable path in
diff/ uses its own bounded sampler).  Works on CPU and TPU backends; this is
also the semantics oracle for the Pallas kernel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.constants import (
    BRANCH,
    EMPTY,
    EPS,
    LEAF,
    MAX_STEPS,
    TWIG,
    TWIG_DEPTH,
    TWIG_SIZE,
    TWIG_WORDS,
)
from ..core.geometry import enter_distance, escape_distance, inv_dir, is_inside
from ..world.device import DeviceWorld


@struct.dataclass
class MarchResult:
    hit: Any        # bool[N]
    t: Any          # float32[N] distance to hit (inf when miss)
    material: Any   # int32[N] material id (0 when miss)
    cell_bmin: Any  # float32[N,3] hit cell min corner
    cell_size: Any  # float32[N] hit cell edge
    steps: Any      # int32[N] traversal cost (debug AOV, reference `steps`)


def _descend(world: DeviceWorld, p, tree_off):
    """Fixed-depth point location: returns (node_word, cell_bmin, cell_size).

    p: f32[N,3]; tree_off: i32[N] chunk tree-pool base."""
    n = p.shape[0]
    cs = jnp.float32(world.chunksize)
    # Chunk-local cell state.
    q = jnp.floor(p / cs) * cs
    bmin = q
    size = jnp.full((n,), cs, dtype=jnp.float32)
    idx = jnp.zeros((n,), dtype=jnp.int32)

    tree = world.tree

    def body(_, carry):
        idx, bmin, size = carry
        word = tree[tree_off + idx]
        is_branch = (word >> jnp.uint32(30)) == BRANCH
        payload = (word & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)
        half = size * 0.5
        mid = bmin + half[:, None]
        ge = p >= mid
        child = payload + (
            ge[:, 0].astype(jnp.int32)
            + 2 * ge[:, 1].astype(jnp.int32)
            + 4 * ge[:, 2].astype(jnp.int32)
        )
        idx = jnp.where(is_branch, child, idx)
        bmin = jnp.where(is_branch[:, None], bmin + ge * half[:, None], bmin)
        size = jnp.where(is_branch, half, size)
        return idx, bmin, size

    idx, bmin, size = jax.lax.fori_loop(0, world.depth, body, (idx, bmin, size))
    word = tree[tree_off + idx]
    return word, bmin, size


def march(
    world: DeviceWorld,
    origins,
    dirs,
    max_steps: int = MAX_STEPS,
) -> MarchResult:
    """March N rays; returns a MarchResult of arrays over the ray batch."""
    world = jax.tree_util.tree_map(jnp.asarray, world)
    a = jnp.asarray(origins, dtype=jnp.float32)
    b = jnp.asarray(dirs, dtype=jnp.float32)
    n = a.shape[0]
    g = inv_dir(b)

    cs = jnp.float32(world.chunksize)
    w, h, d = world.dims
    grid = jnp.asarray([w, h, d], dtype=jnp.float32)
    lo = world.chunkcoordmin * cs
    hi = lo + grid * cs

    # Entry: rays starting outside the world box advance to its surface.
    tn, enter_ok = enter_distance(a, g, lo, hi)
    inside0 = is_inside(a, lo, hi)
    t0 = jnp.where(inside0, jnp.float32(0.0), tn + jnp.float32(EPS))
    active0 = inside0 | enter_ok

    state = dict(
        t=t0,
        active=active0,
        hit=jnp.zeros(n, dtype=bool),
        material=jnp.zeros(n, dtype=jnp.int32),
        cell_bmin=jnp.zeros((n, 3), dtype=jnp.float32),
        cell_size=jnp.zeros(n, dtype=jnp.float32),
        steps=jnp.zeros(n, dtype=jnp.int32),
        step=jnp.int32(0),
    )

    wi = jnp.int32(w)
    hi_ = jnp.int32(h)
    di = jnp.int32(d)

    def cond(s):
        return (s["step"] < max_steps) & jnp.any(s["active"])

    def body(s):
        t, active = s["t"], s["active"]
        p = a + b * t[:, None]

        in_world = is_inside(p, lo, hi)
        active = active & in_world

        # Toroidal chunk lookup (reference chunkIndex, Chunkmarch.glsl:156-167).
        q = jnp.floor(p / cs).astype(jnp.int32)
        ci = (
            jnp.mod(q[:, 0], wi)
            + jnp.mod(q[:, 2], di) * wi
            + jnp.mod(q[:, 1], hi_) * wi * di
        )
        ci = jnp.clip(ci, 0, world.num_chunks - 1)
        cb = world.chunk_bmin[ci]
        # Stored chunk must cover the query cell (it may not, mid-stream).
        covers = is_inside(p, cb, cb + cs)
        active = active & covers

        tree_off = world.chunk_tree[ci]
        twig_off = world.chunk_twig[ci]

        word, bmin, size = _descend(world, p, tree_off)
        ty = (word >> jnp.uint32(30)).astype(jnp.int32)
        payload = (word & jnp.uint32((1 << 30) - 1)).astype(jnp.int32)

        # Twig texel lookup for rays standing in a TWIG cell.
        leafsize = size / jnp.float32(TWIG_SIZE)
        toff = jnp.clip(
            ((p - bmin) / leafsize[:, None]).astype(jnp.int32), 0, TWIG_SIZE - 1
        )
        tword = (
            toff[:, 2] * (TWIG_SIZE * TWIG_SIZE) + toff[:, 1] * TWIG_SIZE + toff[:, 0]
        )
        twig_idx = (twig_off + payload) * TWIG_WORDS + tword
        tex_mat = world.twig[jnp.clip(twig_idx, 0, world.twig.shape[0] - 1)].astype(
            jnp.int32
        )

        is_twig = ty == TWIG
        is_leaf = ty == LEAF
        tex_hit = is_twig & (tex_mat != 0)

        hit_now = active & (is_leaf | tex_hit)
        hit_mat = jnp.where(is_leaf, payload, tex_mat)
        hit_bmin = jnp.where(
            is_leaf[:, None], bmin, bmin + toff.astype(jnp.float32) * leafsize[:, None]
        )
        hit_size = jnp.where(is_leaf, size, leafsize)

        # Advance: empty cell -> cell escape; twig miss -> texel escape.
        cell_esc = escape_distance(p, g, bmin, bmin + size[:, None])
        texel_min = bmin + toff.astype(jnp.float32) * leafsize[:, None]
        texel_esc = escape_distance(p, g, texel_min, texel_min + leafsize[:, None])
        esc = jnp.where(is_twig, texel_esc, cell_esc) + jnp.float32(EPS)

        new_t = jnp.where(active & ~hit_now, t + esc, t)

        return dict(
            t=jnp.where(hit_now, t, new_t),
            active=active & ~hit_now,
            hit=s["hit"] | hit_now,
            material=jnp.where(hit_now, hit_mat, s["material"]),
            cell_bmin=jnp.where(hit_now[:, None], hit_bmin, s["cell_bmin"]),
            cell_size=jnp.where(hit_now, hit_size, s["cell_size"]),
            steps=s["steps"] + active.astype(jnp.int32),
            step=s["step"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)
    return MarchResult(
        hit=s["hit"],
        t=jnp.where(s["hit"], s["t"], jnp.float32(jnp.inf)),
        material=jnp.where(s["hit"], s["material"], 0),
        cell_bmin=s["cell_bmin"],
        cell_size=s["cell_size"],
        steps=s["steps"],
    )


__all__ = ["march", "MarchResult"]
