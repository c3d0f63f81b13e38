"""Mutation layer tests: box edits, free-list allocator, world orchestration.

Mirrors the reference's (untested) edit/streaming capabilities
(src/Octree.cpp:203-443, src/Allocator.cpp, src/World.cpp:268-378) with the
oracle strategy from SURVEY.md section 4: every edited chunk is cross-checked
CPU-oracle vs device marcher, and incremental device patches must equal a
from-scratch repack.
"""

import numpy as np
import pytest

from octree_raymarcher_tpu.core.chunk import Chunk
from octree_raymarcher_tpu.core.constants import TWIG_WORDS
from octree_raymarcher_tpu.core.nodes import EMPTY, LEAF, node_type
from octree_raymarcher_tpu.march import cpu_ref
from octree_raymarcher_tpu.ops.march_jnp import march
from octree_raymarcher_tpu.world.alloc import FreeList, WorldAllocator
from octree_raymarcher_tpu.world.edit import build, destroy, replace
from octree_raymarcher_tpu.world.world import World
from octree_raymarcher_tpu.world.device import single_chunk_world


# ---------------------------------------------------------------- free list
def test_freelist_take_give_coalesce():
    fl = FreeList(64)
    a = fl.take(16)
    b = fl.take(16)
    c = fl.take(16)
    assert (a, b, c) == (0, 16, 32)
    fl.give(a, 16)
    fl.give(c, 16)
    assert fl.spans == [[0, 16], [32, 32]]  # tail span merged with [48,64)
    fl.give(b, 16)             # middle release merges everything
    assert fl.spans == [[0, 64]]
    assert fl.free == 64


def test_freelist_first_fit_and_extend():
    fl = FreeList(32)
    a = fl.take(8)
    b = fl.take(8)
    fl.give(a, 8)
    assert fl.take(4) == 0          # first fit reuses the head hole
    assert fl.take(20) is None      # nothing fits
    fl.extend(96)
    off = fl.take(20)
    assert off is not None and off + 20 <= 96
    fl.give(b, 8)
    fl.check()


# ------------------------------------------------------------------- edits
def _solid_chunk(size=16.0, depth=4, mat=2):
    c = Chunk.empty_chunk((0.0, 0.0, 0.0), size, depth)
    build(c, (0, 0, 0), (size, size, size), mat)
    assert node_type(int(c.tree[0])) == LEAF
    return c


def _march_down(c, x, z, world=None):
    """CPU-oracle ray straight down at (x, z); returns Hit."""
    return cpu_ref.treemarch(c, np.array([x, c.size - 1e-3, z]), np.array([0.0, -1.0, 0.0]))


def test_build_full_box_is_single_leaf():
    c = _solid_chunk()
    assert c.ntrees == 1


def test_destroy_carves_hole():
    c = _solid_chunk(16.0, 4, mat=3)
    destroy(c, (4, 8, 4), (12, 16, 12))
    h_in = _march_down(c, 8.0, 8.0)
    assert h_in.hit and np.isclose(h_in.t, 16.0 - 1e-3 - 8.0, atol=0.01)
    h_out = _march_down(c, 2.0, 2.0)
    assert h_out.hit and h_out.t < 0.01  # outside the hole: still solid at top
    # dirty ranges were recorded
    dt, dw = destroy(c, (0, 0, 0), (16, 16, 16))
    assert node_type(int(c.tree[0])) == EMPTY
    assert not dt.empty


def test_destroy_subvoxel_uses_twigs():
    c = _solid_chunk(16.0, 4, mat=2)
    # carve a single 1-unit voxel: at depth 4, cell=1 is below the 4^3 twig
    # level (twig level cells are 4 units), so a twig must appear.
    destroy(c, (4, 15, 4), (5, 16, 5))
    assert c.ntwigs >= 1
    h = _march_down(c, 4.5, 4.5)
    assert h.hit and np.isclose(h.t, 1.0 - 1e-3, atol=0.01)
    h2 = _march_down(c, 5.5, 4.5)
    assert h2.hit and h2.t < 0.01


def test_build_only_fills_empty():
    c = Chunk.empty_chunk((0.0, 0.0, 0.0), 16.0, 4)
    build(c, (0, 0, 0), (16, 8, 16), 2)       # floor of stone
    build(c, (0, 0, 0), (16, 16, 16), 6)      # flood water everywhere
    h = _march_down(c, 3.0, 3.0)
    assert h.hit and h.material == 6          # water surface on top
    # below the waterline the stone is intact
    h2 = cpu_ref.treemarch(
        c, np.array([3.0, 7.5, 3.0]), np.array([0.0, -1.0, 0.0])
    )
    assert h2.hit and h2.material == 2


def test_replace_overwrites():
    c = _solid_chunk(16.0, 4, mat=2)
    replace(c, (0, 8, 0), (8, 16, 8), 5)
    h = _march_down(c, 4.0, 4.0)
    assert h.hit and h.material == 5
    h2 = _march_down(c, 12.0, 12.0)
    assert h2.hit and h2.material == 2


def test_edit_parity_cpu_vs_device(rng):
    """After a random edit sequence the device marcher must agree with the
    CPU oracle on a batch of rays (the SURVEY section 4 oracle axis)."""
    c = _solid_chunk(16.0, 4, mat=2)
    destroy(c, (2, 10, 2), (14, 16, 14))
    build(c, (5, 12, 5), (9, 14.5, 9), 4)
    destroy(c, (6, 0, 6), (7, 16, 7))

    n = 64
    origins = np.stack(
        [
            rng.uniform(0, 16, n),
            np.full(n, 24.0),
            rng.uniform(0, 16, n),
        ],
        axis=1,
    ).astype(np.float32)
    dirs = np.tile(np.array([[0.001, -1.0, 0.001]], np.float32), (n, 1))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    dev = single_chunk_world(c)
    r = march(dev, origins, dirs)
    hits = np.asarray(r.hit)
    ts = np.asarray(r.t)
    mats = np.asarray(r.material)
    for i in range(n):
        h = cpu_ref.chunkmarch(_Shim(c), origins[i], dirs[i])
        assert hits[i] == h.hit, i
        if h.hit:
            assert np.isclose(ts[i], h.t, atol=0.05), (i, ts[i], h.t)
            assert mats[i] == h.material, i


class _Shim:
    """1-chunk world protocol for cpu_ref.chunkmarch."""

    def __init__(self, chunk):
        self.chunk = chunk
        self.chunksize = chunk.size
        self.dims = (1, 1, 1)
        self.chunkcoordmin = np.array([0, 0, 0])

    def chunk_at(self, *_):
        return self.chunk


# ------------------------------------------------- allocator + incremental
def test_incremental_patch_equals_repack(rng):
    chunks = [_solid_chunk(16.0, 4, mat=m + 1) for m in range(4)]
    for i, c in enumerate(chunks):
        c.position = np.array([(i % 2) * 16.0, 0.0, (i // 2) * 16.0], np.float32)
    wa, dev = WorldAllocator.pack(chunks, (2, 1, 2))

    # edit chunk 3 heavily (forces twig creation and possible block growth)
    for k in range(6):
        dt, dw = destroy(
            chunks[3], (16 + k, 10 + k * 0.5, 16 + k), (17 + k, 16, 17 + k)
        )
        dev = wa.modify(dev, 3, chunks[3], dt, dw)

    wa2, dev2 = WorldAllocator.pack(chunks, (2, 1, 2))
    n = 128
    origins = np.stack(
        [rng.uniform(0, 32, n), np.full(n, 40.0), rng.uniform(0, 32, n)], axis=1
    ).astype(np.float32)
    dirs = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    r1 = march(dev, origins, dirs)
    r2 = march(dev2, origins, dirs)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_allclose(
        np.asarray(r1.t)[np.asarray(r1.hit)],
        np.asarray(r2.t)[np.asarray(r2.hit)],
        atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(r1.material), np.asarray(r2.material))


def test_pool_growth_relocates_block():
    chunks = [Chunk.empty_chunk((i * 8.0, 0.0, 0.0), 8.0, 3) for i in range(2)]
    wa, dev = WorldAllocator.pack(chunks, (2, 1, 1), slack=1.0)
    cap0 = wa.tree.capacity
    # grow chunk 0's tree far past its reservation
    dt, dw = build(chunks[0], (0.5, 0.5, 0.5), (7.5, 7.5, 7.5), 2)
    dev = wa.modify(dev, 0, chunks[0], dt, dw)
    assert wa.tree.capacity >= cap0
    assert dev.tree.shape[0] == wa.tree.capacity
    # marched result still matches a fresh pack
    _, dev2 = WorldAllocator.pack(chunks, (2, 1, 1))
    o = np.array([[4.0, 12.0, 4.0]], np.float32)
    d = np.array([[0.0, -1.0, 0.0]], np.float32)
    r1, r2 = march(dev, o, d), march(dev2, o, d)
    assert bool(r1.hit[0]) == bool(r2.hit[0]) is True
    assert np.isclose(float(r1.t[0]), float(r2.t[0]), atol=1e-4)


# ------------------------------------------------------------------ world
@pytest.fixture(scope="module")
def small_world():
    return World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=7,
                          water_level=4.0, amplitude=16.0)


def test_world_generate_water(small_world):
    w = small_world
    assert len(w.chunks) == 4
    # some column below the water line reports water at the surface
    found_water = False
    for x in (5.0, 17.0, 40.0, 55.0):
        for z in (5.0, 17.0, 40.0, 55.0):
            h = cpu_ref.chunkmarch(
                w, np.array([x, 30.0, z]), np.array([0.0, -1.0, 0.0])
            )
            if h.hit and h.material == 6:
                found_water = True
    assert found_water


def test_world_toroidal_index(small_world):
    w = small_world
    assert w.index(0, 0, 0) == w.index(2, 1, 2)
    assert w.index(-1, 0, 0) == w.index(1, 0, 0)


def test_world_edit_multi_chunk(small_world):
    import copy

    w = copy.deepcopy(small_world)
    wa, dev = w.to_device()
    # a box spanning the chunk seam at x=32
    edits = w.replace((24, 10, 8), (40, 20, 24), 3)
    assert len(edits) >= 2  # touched both x-chunks
    dev = w.apply(wa, dev, edits)
    o = np.array([[28.0, 50.0, 16.0], [36.0, 50.0, 16.0]], np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (2, 1))
    r = march(dev, o, d)
    assert bool(r.hit[0]) and bool(r.hit[1])
    assert int(r.material[0]) == 3 and int(r.material[1]) == 3
    np.testing.assert_allclose(np.asarray(r.t), [30.0, 30.0], atol=0.05)


def test_world_shift_streams(small_world):
    import copy

    w = copy.deepcopy(small_world)
    wa, dev = w.to_device()
    touched = w.shift(0, +1)
    assert len(touched) == 1 * 1 * 2  # one x-slab: h*d chunks
    dev = w.apply_shift(wa, dev, touched)
    assert np.allclose(np.asarray(dev.chunkcoordmin), [1, 0, 0])
    # the entering slab is now chunk coord x=2; its stored position must match
    i = w.index(2, 0, 0)
    assert np.allclose(w.chunks[i].position, [64.0, 0.0, 0.0])
    # device world still marches consistently with the CPU oracle
    o = np.array([70.0, 30.0, 10.0], np.float32)
    d = np.array([0.0, -1.0, 0.0], np.float32)
    h = cpu_ref.chunkmarch(w, o, d)
    r = march(dev, o[None], d[None])
    assert bool(r.hit[0]) == h.hit
    if h.hit:
        assert np.isclose(float(r.t[0]), h.t, atol=0.05)


def test_world_save_load_roundtrip(tmp_path, small_world):
    p = str(tmp_path / "world.npz")
    small_world.save(p)
    w2 = World.load(p)
    assert w2.dims == small_world.dims
    for a, b in zip(small_world.chunks, w2.chunks):
        np.testing.assert_array_equal(a.tree[: a.ntrees], b.tree[: b.ntrees])
        np.testing.assert_array_equal(a.twig[: a.ntwigs], b.twig[: b.ntwigs])
    rep = w2.memory_report()
    assert rep["chunks"] == 4 and rep["trees"] > 0
