"""Unit tests for node packing and ray/box geometry."""

import numpy as np
import pytest

from octree_raymarcher_tpu.core import (
    BRANCH,
    EMPTY,
    LEAF,
    TWIG,
    branch_cut,
    branch_index,
    node_payload,
    node_type,
    pack,
    pack_scalar,
    twig_word,
)
from octree_raymarcher_tpu.core.constants import BIGEPS, EPS, TWIG_SIZE, TWIG_WORDS


def test_pack_roundtrip_scalar():
    for t in (EMPTY, LEAF, BRANCH, TWIG):
        for off in (0, 1, 12345, (1 << 30) - 1):
            w = pack_scalar(t, off)
            assert node_type(w) == t
            assert node_payload(w) == off


def test_pack_roundtrip_array():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, size=1000).astype(np.uint32)
    off = rng.integers(0, 1 << 30, size=1000).astype(np.uint32)
    w = pack(t, off)
    assert w.dtype == np.uint32
    np.testing.assert_array_equal(node_type(w), t)
    np.testing.assert_array_equal(node_payload(w), off)


def test_pack_bounds_checked():
    with pytest.raises(AssertionError):
        pack_scalar(4, 0)
    with pytest.raises(AssertionError):
        pack_scalar(0, 1 << 30)


def test_branch_index_cut_roundtrip():
    seen = set()
    for i in range(8):
        xg, yg, zg = branch_cut(i)
        assert branch_index(xg, yg, zg) == i
        seen.add((xg, yg, zg))
    assert len(seen) == 8


def test_branch_index_vectorized():
    xg = np.array([0, 1, 0, 1], dtype=bool)
    yg = np.array([0, 0, 1, 1], dtype=bool)
    zg = np.array([0, 1, 1, 0], dtype=bool)
    np.testing.assert_array_equal(branch_index(xg, yg, zg), [0, 5, 6, 3])


def test_twig_word_layout():
    # z-major, then y, then x; bijective over the 64 texels
    words = set()
    for z in range(TWIG_SIZE):
        for y in range(TWIG_SIZE):
            for x in range(TWIG_SIZE):
                words.add(twig_word(x, y, z))
    assert words == set(range(TWIG_WORDS))
    assert twig_word(1, 2, 3) == 3 * 16 + 2 * 4 + 1


def test_geometry_escape_and_enter():
    import jax.numpy as jnp

    from octree_raymarcher_tpu.core.geometry import (
        enter_distance,
        escape_distance,
        inv_dir,
        is_inside,
    )

    p = jnp.array([0.5, 0.5, 0.5], dtype=jnp.float32)
    d = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32)
    g = inv_dir(d)
    cmin = jnp.zeros(3, dtype=jnp.float32)
    cmax = jnp.ones(3, dtype=jnp.float32)

    assert bool(is_inside(p, cmin, cmax))
    esc = float(escape_distance(p, g, cmin, cmax))
    assert abs(esc - 0.5) < 1e-6

    # from outside, enter distance along +x
    p2 = jnp.array([-1.0, 0.5, 0.5], dtype=jnp.float32)
    tn, ok = enter_distance(p2, g, cmin, cmax)
    assert bool(ok) and abs(float(tn) - 1.0) < 1e-6

    # box behind the ray -> no hit
    p3 = jnp.array([2.0, 0.5, 0.5], dtype=jnp.float32)
    _, ok3 = enter_distance(p3, g, cmin, cmax)
    assert not bool(ok3)


def test_geometry_degenerate_escape_clamps():
    import jax.numpy as jnp

    from octree_raymarcher_tpu.core.geometry import escape_distance, inv_dir

    # Ray exactly on the far face: escape would be ~0 -> clamps to BIGEPS
    p = jnp.array([1.0, 0.5, 0.5], dtype=jnp.float32)
    g = inv_dir(jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32))
    esc = float(escape_distance(p, g, jnp.zeros(3), jnp.ones(3)))
    assert abs(esc - BIGEPS) < 1e-7


def test_cube_normal_faces():
    import jax.numpy as jnp

    from octree_raymarcher_tpu.core.geometry import cube_normal

    cmin = jnp.zeros(3, dtype=jnp.float32)
    cmax = jnp.ones(3, dtype=jnp.float32)
    n = cube_normal(jnp.array([0.0, 0.5, 0.5], dtype=jnp.float32), cmin, cmax)
    np.testing.assert_allclose(np.asarray(n), [-1, 0, 0], atol=1e-6)
    n = cube_normal(jnp.array([0.5, 1.0, 0.5], dtype=jnp.float32), cmin, cmax)
    np.testing.assert_allclose(np.asarray(n), [0, 1, 0], atol=1e-6)


def test_chunk_pool_growth():
    from octree_raymarcher_tpu.core import Chunk, Dirty

    c = Chunk.empty_chunk([0, 0, 0], 64.0, 6)
    assert c.ntrees == 1 and c.ntwigs == 0
    d = Dirty()
    c.append_trees(np.zeros(100, dtype=np.uint32), d)
    assert c.ntrees == 101 and len(c.tree) >= 101
    assert d.realloc and d.left == 1 and d.right == 101
    t = np.arange(64, dtype=np.uint16)
    i = c.append_twig(t)
    np.testing.assert_array_equal(c.twig[i], t)
    rep = c.memory_report()
    assert rep["trees"] == 101 and rep["twigs"] == 1
