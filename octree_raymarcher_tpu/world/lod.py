"""Compaction (defrag) and LOD generation, vectorized through a dense grid.

Capability parity with the reference's defragcopy + lodmm
(src/Octree.cpp:445-765): defrag rebuilds a chunk into a fresh compact arena
with every collapsible subtree canonicalized (mono-material twigs -> LEAF /
EMPTY, mono branches collapsed), and lod() produces a depth-(d-1) chunk whose
new finest texels are the volume-weighted majority material of the region
they cover (the reference streams that majority through a Misra-Gries
counter, src/MisraGries.h:58-104; with the full grid in memory a bincount
mode is exact and vectorized).

TPU-first redesign: instead of pointer-chasing recursion we round-trip
through the dense material grid — ``to_dense`` rasterizes the octree
(O(R^3) writes), ``from_dense`` rebuilds a *maximally collapsed* octree
level-synchronously from a uniformity mip — so defrag(c) =
from_dense(to_dense(c)) is canonical by construction, and lod(c) is a 2:1
majority downsample between the two.  R = 2^depth (<= 256 for the default
world), so the intermediate grid is at most 32 MiB.
"""

from __future__ import annotations

import numpy as np

from ..core.chunk import Chunk
from ..core.constants import TWIG_DEPTH, TWIG_SIZE, TWIG_WORDS
from ..core.nodes import BRANCH, EMPTY, LEAF, TWIG, node_payload, node_type, pack

_OCTANT = [(i & 1, (i >> 1) & 1, (i >> 2) & 1) for i in range(8)]  # x+2y+4z order


def to_dense(chunk: Chunk) -> np.ndarray:
    """Rasterize the octree to uint16[R, R, R] materials, indexed [z, y, x]
    (the twig word order z*16 + y*4 + x extended to the whole chunk)."""
    assert chunk.depth <= 9, (
        f"dense-grid defrag/LOD materializes (2^depth)^3 uint16 "
        f"({(1 << chunk.depth) ** 3 * 2 / 2**20:.0f} MiB at depth "
        f"{chunk.depth}); use depth <= 9 or add a level-sparse path"
    )
    R = 1 << chunk.depth
    grid = np.zeros((R, R, R), dtype=np.uint16)
    # (node index, x0, y0, z0, cell edge in texels)
    stack = [(0, 0, 0, 0, R)]
    while stack:
        idx, x0, y0, z0, s = stack.pop()
        word = int(chunk.tree[idx])
        ty = node_type(word)
        if ty == EMPTY:
            continue
        if ty == LEAF:
            grid[z0 : z0 + s, y0 : y0 + s, x0 : x0 + s] = node_payload(word)
        elif ty == TWIG:
            tex = chunk.twig[node_payload(word)].reshape(
                TWIG_SIZE, TWIG_SIZE, TWIG_SIZE
            )  # [z, y, x]
            assert s == TWIG_SIZE, "twig below its level"
            grid[z0 : z0 + s, y0 : y0 + s, x0 : x0 + s] = tex
        else:  # BRANCH
            base = node_payload(word)
            h = s // 2
            for i, (ox, oy, oz) in enumerate(_OCTANT):
                stack.append((base + i, x0 + ox * h, y0 + oy * h, z0 + oz * h, h))
    return grid


def from_dense(grid: np.ndarray, position, size: float, depth: int) -> Chunk:
    """Build a maximally-collapsed octree from a dense [z, y, x] material
    grid (level-synchronous, like worldgen/grow.py but driven by a
    uniformity mip instead of the bounds pyramid)."""
    R = 1 << depth
    assert grid.shape == (R, R, R), (grid.shape, R)
    twig_level = depth - TWIG_DEPTH
    T = 1 << twig_level

    # Uniformity mip: uni[lv][cell] = material if the cell is uniform, else -1.
    # Base level: 4^3 twig blocks.
    blocks = grid.reshape(T, TWIG_SIZE, T, TWIG_SIZE, T, TWIG_SIZE)
    blocks = blocks.transpose(0, 2, 4, 1, 3, 5).reshape(T, T, T, TWIG_WORDS)
    uniform = (blocks == blocks[..., :1]).all(axis=-1)
    uni = [np.where(uniform, blocks[..., 0].astype(np.int32), -1)]  # [z, y, x]
    for _ in range(twig_level):
        u = uni[-1]
        s = u.shape[0] // 2
        c = u.reshape(s, 2, s, 2, s, 2)
        first = c[:, 0, :, 0, :, 0]
        same = (c == first[:, None, :, None, :, None]).all(axis=(1, 3, 5))
        uni.append(np.where(same & (first >= 0), first, -1))
    uni.reverse()  # uni[lv] now has 2^lv cells per axis, lv = 0..twig_level

    chunk = Chunk.empty_chunk(position, float(size), depth)
    # Active cells per level as texel coordinates (x, y, z) + node indices.
    coords = np.zeros((1, 3), dtype=np.int64)
    offs = np.array([0], dtype=np.int64)
    for lv in range(twig_level + 1):
        if len(offs) == 0:
            break
        cells = R >> lv
        u = uni[lv][coords[:, 2] // cells, coords[:, 1] // cells, coords[:, 0] // cells]
        is_uniform = u >= 0
        is_twig = (~is_uniform) & (lv == twig_level)
        is_branch = (~is_uniform) & (~is_twig)

        words = np.zeros(len(offs), dtype=np.uint32)
        words[is_uniform & (u > 0)] = pack(
            np.uint32(LEAF), u[is_uniform & (u > 0)].astype(np.uint32)
        )
        # u == 0 stays EMPTY (words already 0)

        if is_twig.any():
            tc = coords[is_twig]
            m = len(tc)
            tex = blocks[
                tc[:, 2] // TWIG_SIZE, tc[:, 1] // TWIG_SIZE, tc[:, 0] // TWIG_SIZE
            ]  # [m, 64]
            base = chunk.ntwigs
            chunk.reserve_twigs(m)
            chunk.twig[base : base + m] = tex.astype(np.uint16)
            chunk.ntwigs += m
            words[is_twig] = pack(
                np.full(m, TWIG, dtype=np.uint32),
                (base + np.arange(m)).astype(np.uint32),
            )

        nb = int(is_branch.sum())
        if nb > 0:
            chunk.reserve_trees(8 * nb)
            child_base = chunk.ntrees + 8 * np.arange(nb, dtype=np.int64)
            words[is_branch] = pack(
                np.full(nb, BRANCH, dtype=np.uint32), child_base.astype(np.uint32)
            )
            chunk.ntrees += 8 * nb
            half = cells // 2
            oct_off = np.array(_OCTANT, dtype=np.int64) * half  # [8, 3] (x,y,z)
            coords_next = (
                coords[is_branch][:, None, :] + oct_off[None, :, :]
            ).reshape(-1, 3)
            offs_next = (child_base[:, None] + np.arange(8)[None, :]).reshape(-1)
        else:
            coords_next = np.zeros((0, 3), dtype=np.int64)
            offs_next = np.array([], dtype=np.int64)

        chunk.tree[offs] = words
        coords, offs = coords_next, offs_next

    # Trim pools to exact counts (reference defragcopy shrink,
    # src/Octree.cpp:616-620).
    chunk.tree = chunk.tree[: max(1, chunk.ntrees)].copy()
    chunk.twig = chunk.twig[: max(1, chunk.ntwigs)].copy()
    return chunk


def defrag(chunk: Chunk) -> Chunk:
    """Compact + canonicalize a chunk (reference defragcopy,
    src/Octree.cpp:445-621): orphaned pool entries are dropped, collapsible
    subtrees become single nodes, pools shrink to exact size."""
    return from_dense(to_dense(chunk), chunk.position, chunk.size, chunk.depth)


def majority_downsample(grid: np.ndarray) -> np.ndarray:
    """2:1 downsample by volume-weighted majority material per 2^3 block
    (emptiness competes: a mostly-empty block stays empty — reference
    lodmm's density()-weighted Misra-Gries vote, src/Octree.cpp:628-745)."""
    s = grid.shape[0] // 2
    out = np.empty((s, s, s), dtype=grid.dtype)
    slab = max(1, min(s, (1 << 22) // max(1, s * s)))  # bound transient memory
    for z0 in range(0, s, slab):
        z1 = min(s, z0 + slab)
        c = (
            grid[2 * z0 : 2 * z1]
            .reshape(z1 - z0, 2, s, 2, s, 2)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(z1 - z0, s, s, 8)
        )
        srt = np.sort(c, axis=-1)
        cnt = (srt[..., :, None] == srt[..., None, :]).sum(-1)   # occurrences
        best = np.argmax(cnt, axis=-1, keepdims=True)            # ties -> lowest id
        out[z0:z1] = np.take_along_axis(srt, best, axis=-1)[..., 0]
    return out


def lod(chunk: Chunk) -> Chunk:
    """Half-resolution LOD chunk: same position/size, depth-1, each finest
    texel the weighted majority material of the 2^3 region it covers
    (reference lodmm, src/Octree.cpp:624-765)."""
    assert chunk.depth > TWIG_DEPTH, "cannot LOD below the twig level"
    dense = to_dense(chunk)
    return from_dense(
        majority_downsample(dense), chunk.position, chunk.size, chunk.depth - 1
    )


__all__ = ["to_dense", "from_dense", "defrag", "lod", "majority_downsample"]
