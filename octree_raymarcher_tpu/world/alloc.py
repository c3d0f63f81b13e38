"""HBM arena allocator: free-list pools + incremental device patching.

TPU analog of the reference's GPU residency layer (LinkedFreeChunkList /
Region / Allocator / RootAllocator, src/Allocator.cpp:7-266): each chunk owns
a block in the device tree pool and one in the twig pool, tracked host-side
by a sorted coalescing free list; edits patch only their dirty subrange into
the device arrays (the ``glBufferSubData`` analog is a donated-buffer
``dynamic_update_slice``), and a block that outgrows its slot is freed and
re-placed first-fit, doubling the arena when full (reference Region::grow,
src/Allocator.cpp:138-159).

Host-side metadata is plain Python (exact integer arithmetic, no tracing);
only the byte movement runs on device.  A C++ implementation of the free
list with the same semantics lives in native/ (used when built, this file is
the always-available fallback and the semantics oracle for its tests).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.chunk import Chunk, Dirty
from ..core.constants import TWIG_WORDS
from .device import DeviceWorld, occupancy_masks


class FreeList:
    """Sorted [offset, size) spans with coalescing release and first-fit take
    (reference LinkedFreeChunkList, src/Allocator.cpp:191-266)."""

    def __init__(self, capacity: int):
        self.spans: list[list[int]] = [[0, capacity]] if capacity > 0 else []
        self.capacity = capacity

    def take(self, size: int) -> int | None:
        """First-fit allocate; returns offset or None when nothing fits."""
        assert size > 0
        for i, (off, sz) in enumerate(self.spans):
            if sz >= size:
                if sz == size:
                    self.spans.pop(i)
                else:
                    self.spans[i] = [off + size, sz - size]
                return off
        return None

    def give(self, offset: int, size: int) -> None:
        """Release a span, merging with adjacent free neighbours."""
        assert size > 0
        lo = 0
        hi = len(self.spans)
        while lo < hi:                      # insertion point by offset
            mid = (lo + hi) // 2
            if self.spans[mid][0] < offset:
                lo = mid + 1
            else:
                hi = mid
        self.spans.insert(lo, [offset, size])
        # merge right then left
        if lo + 1 < len(self.spans) and offset + size == self.spans[lo + 1][0]:
            self.spans[lo][1] += self.spans[lo + 1][1]
            self.spans.pop(lo + 1)
        if lo > 0 and self.spans[lo - 1][0] + self.spans[lo - 1][1] == offset:
            self.spans[lo - 1][1] += self.spans[lo][1]
            self.spans.pop(lo)

    def extend(self, new_capacity: int) -> None:
        """Grow the arena; the new tail becomes one free span."""
        assert new_capacity > self.capacity
        self.give(self.capacity, new_capacity - self.capacity)
        self.capacity = new_capacity

    @property
    def free(self) -> int:
        return sum(sz for _, sz in self.spans)

    def check(self) -> None:
        """Invariants: spans sorted, non-overlapping, and never adjacent
        (give() must have coalesced them)."""
        for a, b in zip(self.spans, self.spans[1:]):
            assert a[0] + a[1] < b[0], (a, b)
        for off, sz in self.spans:
            assert sz > 0 and 0 <= off and off + sz <= self.capacity, (off, sz)


@dataclasses.dataclass
class Block:
    offset: int   # element offset into the pool
    size: int     # reserved elements (>= used)
    used: int     # elements currently meaningful


class PoolAllocator:
    """Per-key block bookkeeping over one arena (reference Allocator,
    src/Allocator.cpp:63-114, collapsed to one region — growth happens by
    extending the single arena rather than adding regions, which is the
    natural shape for one flat HBM buffer)."""

    def __init__(self, capacity: int, slack: float = 1.5, align: int = 8):
        self.freelist = FreeList(capacity)
        self.blocks: dict[int, Block] = {}
        self.slack = slack
        self.align = align
        self.grown = False   # capacity changed since last device sync

    def _reserve_size(self, used: int) -> int:
        n = max(1, int(used * self.slack))
        return ((n + self.align - 1) // self.align) * self.align

    def place(self, key: int, used: int) -> Block:
        """(Re)place ``key`` with room for ``used`` elements.  Keeps the
        current block when it still fits; otherwise frees it and takes a new
        first-fit span, doubling the arena until one fits."""
        blk = self.blocks.get(key)
        if blk is not None and blk.size >= used:
            blk.used = used
            return blk
        if blk is not None:
            self.freelist.give(blk.offset, blk.size)
        want = self._reserve_size(used)
        off = self.freelist.take(want)
        while off is None:
            self.freelist.extend(max(self.freelist.capacity * 2, want * 2))
            self.grown = True
            off = self.freelist.take(want)
        blk = Block(offset=off, size=want, used=used)
        self.blocks[key] = blk
        return blk

    def free(self, key: int) -> None:
        blk = self.blocks.pop(key, None)
        if blk is not None:
            self.freelist.give(blk.offset, blk.size)

    @property
    def capacity(self) -> int:
        return self.freelist.capacity

    def occupancy(self) -> dict:
        """Pool stats for the metrics HUD (reference Main.cpp:277-311)."""
        used = sum(b.size for b in self.blocks.values())
        return {
            "capacity": self.capacity,
            "reserved": used,
            "utilization": used / max(1, self.capacity),
            "blocks": len(self.blocks),
            "free_spans": len(self.freelist.spans),
        }


def _grow_device(arr, new_len: int):
    pad = new_len - arr.shape[0]
    assert pad >= 0
    if pad == 0:
        return arr
    return jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])


# Donated pool patch: the glBufferSubData analog.  donate_argnums=0 lets XLA
# update the pool buffer in place in HBM instead of copying the whole arena
# per edit (the pools are tens of MB; the dirty range is usually tiny).
@partial(jax.jit, donate_argnums=0, static_argnames=())
def _patch(pool, seg, offset):
    return jax.lax.dynamic_update_slice(pool, seg, (offset,))


# Bucketed variant: jits on the power-of-two BUCKET size, not the exact
# dirty-range length, so a long editing session compiles O(log max_len)
# executables instead of one per distinct dirty length (each TPU compile
# through the tunnel costs seconds-to-minutes).  The bucket's tail beyond
# the real segment is refilled with the pool's current content.
@partial(jax.jit, donate_argnums=0, static_argnames=())
def _patch_blend(pool, seg_padded, offset, n):
    cur = jax.lax.dynamic_slice(pool, (offset,), (seg_padded.shape[0],))
    keep = jnp.arange(seg_padded.shape[0], dtype=jnp.int32) < n
    seg = jnp.where(keep, seg_padded, cur)
    return jax.lax.dynamic_update_slice(pool, seg, (offset,))


def _patch_range(pool, host_seg: np.ndarray, offset: int):
    """Patch ``pool[offset : offset+len(host_seg)] = host_seg`` using a
    power-of-two bucketed executable (see _patch_blend).  Falls back to an
    exact-size patch when the bucket would spill past the pool end
    (dynamic_update_slice clamps start indices, which would misalign)."""
    n = int(host_seg.shape[0])
    bucket = 1 << (n - 1).bit_length() if n > 1 else 1
    if offset + bucket > int(pool.shape[0]) or bucket == n:
        return _patch(pool, jnp.asarray(host_seg), jnp.int32(offset))
    padded = np.zeros(bucket, dtype=host_seg.dtype)
    padded[:n] = host_seg
    return _patch_blend(
        pool, jnp.asarray(padded), jnp.int32(offset), jnp.int32(n)
    )


class WorldAllocator:
    """Pairs the tree and twig pool allocators and applies chunk edits to a
    DeviceWorld functionally (reference RootAllocator::{alloc,subst},
    src/Allocator.cpp:7-61 + World::modify, src/World.cpp:268-274).

    Usage: build once via ``WorldAllocator.pack(chunks, dims)`` (replaces
    world/device.pack_chunks when edits are wanted), then
    ``dev = wa.modify(dev, i, chunk, dtree, dtwig)`` after each host edit.
    """

    def __init__(self, tree: PoolAllocator, twig: PoolAllocator):
        self.tree = tree
        self.twig = twig

    # -- construction ------------------------------------------------------
    @staticmethod
    def pack(
        chunks: list[Chunk],
        dims: tuple,
        chunkcoordmin=(0, 0, 0),
        slack: float = 1.5,
        device: bool = True,
    ) -> tuple["WorldAllocator", DeviceWorld]:
        w, h, d = dims
        assert len(chunks) == w * h * d
        wa = WorldAllocator(
            PoolAllocator(1, slack=slack, align=8),
            PoolAllocator(1, slack=slack, align=2),
        )
        tree_offs, twig_offs = [], []
        for i, c in enumerate(chunks):
            tree_offs.append(wa.tree.place(i, c.ntrees).offset)
            twig_offs.append(wa.twig.place(i, max(1, c.ntwigs)).offset)

        tree = np.zeros(wa.tree.capacity, dtype=np.uint32)
        twig = np.zeros(wa.twig.capacity * TWIG_WORDS, dtype=np.uint32)
        for c, to, wo in zip(chunks, tree_offs, twig_offs):
            tree[to : to + c.ntrees] = c.tree[: c.ntrees]
            twig[wo * TWIG_WORDS : (wo + c.ntwigs) * TWIG_WORDS] = (
                c.twig[: c.ntwigs].astype(np.uint32).reshape(-1)
            )
        wa.tree.grown = wa.twig.grown = False
        # device=False keeps pools as numpy (no transfer): callers that cache
        # pools on disk or defer placement pass False and jnp.asarray later.
        put = jnp.asarray if device else np.asarray
        dev = DeviceWorld(
            tree=put(tree),
            twig=put(twig),
            twig_occ=put(occupancy_masks(twig)),
            chunk_bmin=put(
                np.stack([c.position for c in chunks]).astype(np.float32)
            ),
            chunk_tree=put(np.asarray(tree_offs, dtype=np.int32)),
            chunk_twig=put(np.asarray(twig_offs, dtype=np.int32)),
            chunkcoordmin=put(np.asarray(chunkcoordmin, dtype=np.float32)),
            chunksize=float(chunks[0].size),
            dims=(w, h, d),
            depth=max(c.depth for c in chunks),
        )
        return wa, dev

    # -- incremental update ------------------------------------------------
    def modify(
        self,
        dev: DeviceWorld,
        key: int,
        chunk: Chunk,
        dtree: Dirty,
        dtwig: Dirty,
    ) -> DeviceWorld:
        """Apply one edited chunk's dirty ranges to the device world,
        relocating blocks that outgrew their reservation.  Returns a new
        DeviceWorld (pools donated where possible)."""
        if dtree.empty and dtwig.empty:
            return dev

        old_t = self.tree.blocks.get(key)
        old_w = self.twig.blocks.get(key)
        blk_t = self.tree.place(key, chunk.ntrees)
        blk_w = self.twig.place(key, max(1, chunk.ntwigs))
        moved_t = old_t is None or blk_t.offset != old_t.offset
        moved_w = old_w is None or blk_w.offset != old_w.offset

        tree, twig, occ = dev.tree, dev.twig, dev.twig_occ
        if self.tree.grown:
            tree = _grow_device(tree, self.tree.capacity)
            self.tree.grown = False
        if self.twig.grown:
            twig = _grow_device(twig, self.twig.capacity * TWIG_WORDS)
            occ = _grow_device(occ, self.twig.capacity * 2)
            self.twig.grown = False

        # Tree pool: full re-upload when moved/realloc'd, else dirty range.
        if moved_t or dtree.realloc:
            lo, hi = 0, chunk.ntrees
        else:
            lo, hi = max(0, dtree.left), min(chunk.ntrees, dtree.right)
        if hi > lo:
            tree = _patch_range(tree, np.asarray(chunk.tree[lo:hi]), blk_t.offset + lo)

        # Twig pool (+ occupancy mirror): same policy, twig-index granular.
        if moved_w or dtwig.realloc:
            lo, hi = 0, chunk.ntwigs
        else:
            lo, hi = max(0, dtwig.left), min(chunk.ntwigs, dtwig.right)
        if hi > lo:
            host = chunk.twig[lo:hi].astype(np.uint32).reshape(-1)
            twig = _patch_range(twig, host, (blk_w.offset + lo) * TWIG_WORDS)
            occ = _patch_range(
                occ, occupancy_masks(host), (blk_w.offset + lo) * 2
            )

        return dev.replace(
            tree=tree,
            twig=twig,
            twig_occ=occ,
            chunk_bmin=dev.chunk_bmin.at[key].set(
                jnp.asarray(chunk.position, dtype=jnp.float32)
            ),
            chunk_tree=dev.chunk_tree.at[key].set(blk_t.offset),
            chunk_twig=dev.chunk_twig.at[key].set(blk_w.offset),
        )

    def occupancy(self) -> dict:
        return {"tree": self.tree.occupancy(), "twig": self.twig.occupancy()}


__all__ = ["FreeList", "PoolAllocator", "WorldAllocator", "Block"]
