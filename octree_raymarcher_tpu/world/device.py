"""Device-resident world: HBM pooled arenas + chunk table.

This is the TPU analog of the reference's GPU residency layer (SSBO bindings
2/4/5: chunk table, tree pool, twig pool — src/Allocator.cpp, src/World.h:16-33):
one flat uint32 node pool, one flat uint32 twig-texel pool, and a per-chunk
record of {bmin, tree offset, twig offset}.  Node payloads are chunk-local, so
kernels add the chunk's pool offsets exactly like the GLSL marcher does.

The struct is a flax pytree: pools are leaves (donatable, shardable), grid
geometry is static metadata so jitted kernels specialize on world shape.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
from flax import struct

from ..core.chunk import Chunk
from ..core.constants import TWIG_WORDS


@struct.dataclass
class DeviceWorld:
    # Pools (leaves).
    tree: Any                      # uint32[tree_cap] node pool
    twig: Any                      # uint32[twig_cap * 64] flat twig texels
    twig_occ: Any                  # uint32[twig_cap * 2] 64-bit occupancy masks
    chunk_bmin: Any                # float32[V, 3] chunk min corners
    chunk_tree: Any                # int32[V] chunk base offset into `tree`
    chunk_twig: Any                # int32[V] chunk base *twig index* offset
    chunkcoordmin: Any             # float32[3] min chunk coordinate (streaming)

    # Static geometry (jit-specialized).
    chunksize: float = struct.field(pytree_node=False)
    dims: tuple = struct.field(pytree_node=False)       # (w, h, d) chunks
    depth: int = struct.field(pytree_node=False)        # max octree depth

    @property
    def num_chunks(self) -> int:
        w, h, d = self.dims
        return w * h * d


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def occupancy_masks(twig_flat: np.ndarray) -> np.ndarray:
    """64-bit occupancy bitmask per twig, as uint32 pairs [lo, hi].

    The march inner loop only needs "is this texel solid?"; packing that to
    one bit shrinks the per-step gather table 32x (materials are fetched once
    per ray, after the loop).  This is the TPU answer to the reference's
    16-bit-packed twig dwords (Chunkmarch.glsl:75-98) — optimize for gather
    locality instead of shader ALU."""
    words = twig_flat.reshape(-1, TWIG_WORDS) != 0          # [M, 64] bool
    bits = words.astype(np.uint64) << np.arange(TWIG_WORDS, dtype=np.uint64)
    mask64 = np.bitwise_or.reduce(bits, axis=1)             # [M]
    occ = np.empty(words.shape[0] * 2, dtype=np.uint32)
    occ[0::2] = (mask64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    occ[1::2] = (mask64 >> np.uint64(32)).astype(np.uint32)
    return occ


def pack_chunks(
    chunks: list,
    dims: tuple,
    chunkcoordmin=(0, 0, 0),
    tree_slack: float = 1.0,
    twig_slack: float = 1.0,
) -> DeviceWorld:
    """Assemble host chunks (storage order: index = x + z*w + y*w*d) into
    device pools as numpy arrays; callers jax.device_put the result.

    ``*_slack > 1`` over-allocates pool capacity so in-place edits can grow
    chunks without reallocating the arena.
    """
    w, h, d = dims
    assert len(chunks) == w * h * d, (len(chunks), dims)
    depth = max(c.depth for c in chunks)
    chunksize = chunks[0].size

    tree_offs, twig_offs = [], []
    tree_total, twig_total = 0, 0
    for c in chunks:
        assert c.size == chunksize, "all chunks must share one size"
        tree_offs.append(tree_total)
        twig_offs.append(twig_total)
        tree_total += _round_up(c.ntrees, 8)
        twig_total += c.ntwigs

    tree_cap = _round_up(max(1, int(tree_total * tree_slack)), 128)
    twig_cap = _round_up(max(1, int(twig_total * twig_slack)), 2)

    tree = np.zeros(tree_cap, dtype=np.uint32)
    twig = np.zeros(twig_cap * TWIG_WORDS, dtype=np.uint32)
    for c, to, wo in zip(chunks, tree_offs, twig_offs):
        tree[to : to + c.ntrees] = c.tree[: c.ntrees]
        twig[wo * TWIG_WORDS : (wo + c.ntwigs) * TWIG_WORDS] = (
            c.twig[: c.ntwigs].astype(np.uint32).reshape(-1)
        )

    return DeviceWorld(
        tree=tree,
        twig=twig,
        twig_occ=occupancy_masks(twig),
        chunk_bmin=np.stack([c.position for c in chunks]).astype(np.float32),
        chunk_tree=np.asarray(tree_offs, dtype=np.int32),
        chunk_twig=np.asarray(twig_offs, dtype=np.int32),
        chunkcoordmin=np.asarray(chunkcoordmin, dtype=np.float32),
        chunksize=float(chunksize),
        dims=(w, h, d),
        depth=depth,
    )


def single_chunk_world(chunk: Chunk) -> DeviceWorld:
    """Wrap one chunk as a 1x1x1 world; its position must sit on the chunk grid."""
    coord = np.asarray(chunk.position, dtype=np.float64) / chunk.size
    assert np.allclose(coord, np.round(coord)), "chunk must sit on the chunk grid"
    return pack_chunks([chunk], (1, 1, 1), chunkcoordmin=np.round(coord).astype(np.int64))


__all__ = ["DeviceWorld", "pack_chunks", "single_chunk_world"]
