"""ctypes bindings for the native runtime (native/liboctnative.so).

Two components, each with an always-available Python fallback:
  * NativeFreeList — C++ twin of world/alloc.py FreeList (reference
    LinkedFreeChunkList, src/Allocator.cpp:191-266);
  * native_march — C++ scalar reference marcher over the packed DeviceWorld
    pools (the fast CPU oracle; OpenMP across rays).

``load()`` returns None when the library isn't built (``make -C native``);
callers must fall back to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def load():
    """Load liboctnative.so once; returns the ctypes lib or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "liboctnative.so",
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.c_int64]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_take.restype = ctypes.c_int64
    lib.fl_take.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fl_give.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.fl_extend.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fl_capacity.restype = ctypes.c_int64
    lib.fl_capacity.argtypes = [ctypes.c_void_p]
    lib.fl_free_total.restype = ctypes.c_int64
    lib.fl_free_total.argtypes = [ctypes.c_void_p]
    lib.fl_num_spans.restype = ctypes.c_int64
    lib.fl_num_spans.argtypes = [ctypes.c_void_p]
    lib.fl_spans.restype = ctypes.c_int64
    lib.fl_spans.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.march_rays.restype = ctypes.c_int
    lib.march_rays.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),   # tree
        ctypes.POINTER(ctypes.c_uint32),   # twig
        ctypes.POINTER(ctypes.c_float),    # chunk_bmin
        ctypes.POINTER(ctypes.c_int32),    # chunk_tree
        ctypes.POINTER(ctypes.c_int32),    # chunk_twig
        ctypes.POINTER(ctypes.c_float),    # chunkcoordmin
        ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),    # origins
        ctypes.POINTER(ctypes.c_float),    # dirs
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),    # out_hit
        ctypes.POINTER(ctypes.c_float),    # out_t
        ctypes.POINTER(ctypes.c_int32),    # out_mat
        ctypes.POINTER(ctypes.c_float),    # out_cell_bmin
        ctypes.POINTER(ctypes.c_float),    # out_cell_size
        ctypes.POINTER(ctypes.c_int32),    # out_steps
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


class NativeFreeList:
    """Same interface as world/alloc.py FreeList, backed by C++."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("liboctnative.so not built (make -C native)")
        self._lib = lib
        self._h = lib.fl_create(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fl_destroy(self._h)
            self._h = None

    def take(self, size: int):
        off = self._lib.fl_take(self._h, size)
        return None if off < 0 else off

    def give(self, offset: int, size: int) -> None:
        self._lib.fl_give(self._h, offset, size)

    def extend(self, new_capacity: int) -> None:
        self._lib.fl_extend(self._h, new_capacity)

    @property
    def capacity(self) -> int:
        return self._lib.fl_capacity(self._h)

    @property
    def free(self) -> int:
        return self._lib.fl_free_total(self._h)

    @property
    def spans(self):
        n = self._lib.fl_num_spans(self._h)
        off = (ctypes.c_int64 * n)()
        sz = (ctypes.c_int64 * n)()
        m = self._lib.fl_spans(self._h, off, sz, n)
        return [[off[i], sz[i]] for i in range(m)]

    def check(self) -> None:
        """Same invariant as the Python twin: sorted, non-overlapping, and
        never adjacent (fl_give must coalesce neighbours)."""
        for a, b in zip(self.spans, self.spans[1:]):
            assert a[0] + a[1] < b[0], (a, b)


def native_march(world, origins, dirs, max_steps: int = 640):
    """March rays with the C++ scalar marcher.  ``world`` is a DeviceWorld
    (numpy or jax leaves).  Returns dict of numpy arrays matching
    ops/march_jnp.py MarchResult fields."""
    lib = load()
    if lib is None:
        raise RuntimeError("liboctnative.so not built (make -C native)")
    tree = np.ascontiguousarray(np.asarray(world.tree), dtype=np.uint32)
    twig = np.ascontiguousarray(np.asarray(world.twig), dtype=np.uint32)
    cbm = np.ascontiguousarray(np.asarray(world.chunk_bmin), dtype=np.float32)
    ctree = np.ascontiguousarray(np.asarray(world.chunk_tree), dtype=np.int32)
    ctwig = np.ascontiguousarray(np.asarray(world.chunk_twig), dtype=np.int32)
    ccm = np.ascontiguousarray(np.asarray(world.chunkcoordmin), dtype=np.float32)
    o = np.ascontiguousarray(np.asarray(origins), dtype=np.float32)
    d = np.ascontiguousarray(np.asarray(dirs), dtype=np.float32)
    n = o.shape[0]
    w, h, dd = world.dims

    hit = np.zeros(n, dtype=np.uint8)
    t = np.zeros(n, dtype=np.float32)
    mat = np.zeros(n, dtype=np.int32)
    cell_bmin = np.zeros((n, 3), dtype=np.float32)
    cell_size = np.zeros(n, dtype=np.float32)
    steps = np.zeros(n, dtype=np.int32)

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    lib.march_rays(
        ptr(tree, ctypes.c_uint32), ptr(twig, ctypes.c_uint32),
        ptr(cbm, ctypes.c_float), ptr(ctree, ctypes.c_int32),
        ptr(ctwig, ctypes.c_int32), ptr(ccm, ctypes.c_float),
        ctypes.c_float(world.chunksize), w, h, dd, world.depth,
        ptr(o, ctypes.c_float), ptr(d, ctypes.c_float), n, max_steps,
        ptr(hit, ctypes.c_uint8), ptr(t, ctypes.c_float),
        ptr(mat, ctypes.c_int32), ptr(cell_bmin, ctypes.c_float),
        ptr(cell_size, ctypes.c_float), ptr(steps, ctypes.c_int32),
    )
    return {
        "hit": hit.astype(bool),
        "t": t,
        "material": mat,
        "cell_bmin": cell_bmin,
        "cell_size": cell_size,
        "steps": steps,
    }


__all__ = ["load", "available", "NativeFreeList", "native_march"]
