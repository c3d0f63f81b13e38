"""Screen-block ray ordering for march-tile coherence.

march_tiled slices the ray batch linearly; scanline order makes each tile a
thin horizontal strip whose rays span the whole screen width and diverge in
depth.  Reordering rays into square screen blocks puts spatially-coherent
rays in the same tile, so each tile's lockstep loop exits at the worst ray
of a small neighbourhood instead of a whole scanline band (the TPU analog of
the reference's raster-order fragment locality)."""

from __future__ import annotations

import numpy as np


def block_permutation(height: int, width: int, block: int = 128):
    """Permutation p (and inverse) turning row-major ray order into
    block-major: rays of each (block x block) screen tile are contiguous.
    Returns (perm, inv) int32 arrays of length height*width such that
    reordered = rays[perm] and original = reordered[inv]."""
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    by, bx = ys // block, xs // block
    # sort key: (block row, block col, y, x) — stable row-major inside a block
    key = (((by * ((width + block - 1) // block)) + bx).astype(np.int64) * height
           + ys) * width + xs
    perm = np.argsort(key.reshape(-1), kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


__all__ = ["block_permutation"]
