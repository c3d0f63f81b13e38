"""Worldgen tests: simplex determinism, pyramid invariants, grow correctness."""

import numpy as np

from octree_raymarcher_tpu.core.constants import BRANCH, EMPTY, LEAF, TWIG, TWIG_DEPTH
from octree_raymarcher_tpu.core.nodes import node_payload, node_type, twig_word
from octree_raymarcher_tpu.worldgen import (
    BoundsPyramid,
    grow,
    permutation_table,
    simplex2,
    simplex2_jnp,
)


def make_pyramid(size=64, seed=3):
    return BoundsPyramid.generate(
        size=size, amplitude=16.0, period=1.0 / size, xshift=0.0, yshift=16.0,
        zshift=0.0, seed=seed,
    )


def test_simplex_deterministic_and_bounded():
    perm = permutation_table(42)
    x = np.linspace(-10, 10, 1000).astype(np.float32)
    z = np.linspace(5, 25, 1000).astype(np.float32)
    a = simplex2(x, z, perm)
    b = simplex2(x, z, perm)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.0 and a.max() <= 1.0
    assert a.std() > 0.05  # not constant


def test_simplex_jnp_matches_numpy():
    perm = permutation_table(7)
    x = np.linspace(-3, 3, 512).astype(np.float32)
    z = np.linspace(2, 9, 512).astype(np.float32)
    a = simplex2(x, z, perm)
    b = np.asarray(simplex2_jnp(x, z, perm))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pyramid_min_max_invariants():
    pyr = make_pyramid()
    # mins decrease (or equal) going up; maxs increase; level 0 is global.
    for lv in range(pyr.levels):
        s = 1 << lv
        fine_min = pyr.mins[lv + 1].reshape(s, 2, s, 2)
        fine_max = pyr.maxs[lv + 1].reshape(s, 2, s, 2)
        np.testing.assert_array_equal(pyr.mins[lv], fine_min.min(axis=(1, 3)))
        np.testing.assert_array_equal(pyr.maxs[lv], fine_max.max(axis=(1, 3)))
    assert pyr.mins[0][0, 0] == pyr.base.min()
    assert pyr.maxs[0][0, 0] == pyr.base.max()


def test_pyramid_query_levels():
    pyr = make_pyramid()
    xs = np.array([0.0, 0.25, 0.5, 0.99], dtype=np.float32)
    zs = np.array([0.0, 0.75, 0.1, 0.99], dtype=np.float32)
    for lv in range(pyr.levels + 1):
        lo = pyr.min(xs, zs, lv)
        hi = pyr.max(xs, zs, lv)
        assert np.all(lo <= hi + 1e-6)
    # level-0 query equals global bounds
    glo = pyr.min(xs, zs, 0)
    assert np.allclose(glo, pyr.base.min() * pyr.amplitude + pyr.shift)
    # beyond-base level interpolates within base range
    v = pyr.max(xs, zs, pyr.levels + 2)
    lo_b = pyr.base.min() * pyr.amplitude + pyr.shift
    hi_b = pyr.base.max() * pyr.amplitude + pyr.shift
    assert np.all(v >= lo_b - 1e-4) and np.all(v <= hi_b + 1e-4)


def _check_tree_wellformed(chunk):
    """Every BRANCH points to 8 in-bounds children; every TWIG to a valid brick."""
    seen = np.zeros(chunk.ntrees, dtype=bool)
    stack = [0]
    seen[0] = True
    while stack:
        idx = stack.pop()
        w = int(chunk.tree[idx])
        ty, off = node_type(w), node_payload(w)
        if ty == BRANCH:
            assert off + 8 <= chunk.ntrees, (idx, off, chunk.ntrees)
            for i in range(8):
                assert not seen[off + i], "child visited twice"
                seen[off + i] = True
                stack.append(off + i)
        elif ty == TWIG:
            assert off < chunk.ntwigs
    assert seen.all(), "orphan nodes in pool"


def test_grow_structure_and_sampling():
    pyr = make_pyramid(size=64)
    chunk = grow([0.0, 0.0, 0.0], 64.0, depth=6, pyr=pyr)
    assert chunk.ntrees >= 9  # root must branch for any non-trivial terrain
    _check_tree_wellformed(chunk)

    # Point sampling parity: for random points, descending the tree gives
    # solid iff the column height at that point exceeds the point's y.
    from octree_raymarcher_tpu.march.cpu_ref import descend

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.25, 63.75, size=(200, 3)).astype(np.float32)
    agree = 0
    for p in pts:
        idx, bmin, size = descend(chunk, p)
        w = int(chunk.tree[idx])
        ty = node_type(w)
        if ty == TWIG:
            ls = size / (1 << TWIG_DEPTH)
            off = np.clip(((p - bmin) / ls).astype(int), 0, 3)
            mat = int(chunk.twig[node_payload(w)][twig_word(*off)])
            solid = mat != 0
        else:
            solid = ty == LEAF
        # ground truth from the pyramid base (column max at texel resolution)
        h = float(pyr.max(p[0] / 64.0, p[2] / 64.0, pyr.levels))
        truth = h >= p[1]
        agree += int(solid == truth)
    # Texel quantization makes a small disagreement band inevitable; demand 95%.
    assert agree >= 190, f"only {agree}/200 points agree with heightfield"


def test_grow_empty_and_solid_regions():
    pyr = make_pyramid(size=64)
    lo, hi = pyr.height_range()
    # Chunk far above the terrain: single EMPTY root.
    c_air = grow([0.0, float(hi) + 10.0, 0.0], 64.0, depth=6, pyr=pyr)
    assert c_air.ntrees == 1 and node_type(int(c_air.tree[0])) == EMPTY
    # Chunk far below: single solid LEAF root.
    c_rock = grow([0.0, float(lo) - 100.0, 0.0], 64.0, depth=6, pyr=pyr)
    assert c_rock.ntrees == 1 and node_type(int(c_rock.tree[0])) == LEAF


def test_grow_deterministic():
    pyr = make_pyramid(size=32, seed=9)
    c1 = grow([0, 0, 0], 32.0, 5, pyr)
    c2 = grow([0, 0, 0], 32.0, 5, pyr)
    np.testing.assert_array_equal(c1.tree[: c1.ntrees], c2.tree[: c2.ntrees])
    np.testing.assert_array_equal(c1.twig[: c1.ntwigs], c2.twig[: c2.ntwigs])
