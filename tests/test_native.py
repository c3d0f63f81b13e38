"""Native (C++) runtime component tests: free list + scalar marcher.

The Python implementations (world/alloc.py FreeList, ops/march_jnp.py march)
are the semantics oracles; the native library must agree exactly.
"""

import numpy as np
import pytest

from octree_raymarcher_tpu.utils import native
from octree_raymarcher_tpu.world.alloc import FreeList
from octree_raymarcher_tpu.world.world import World
from octree_raymarcher_tpu.ops.march_jnp import march

pytestmark = pytest.mark.skipif(
    not native.available(), reason="liboctnative.so not built (make -C native)"
)


def test_native_freelist_matches_python(rng):
    py = FreeList(1024)
    nat = native.NativeFreeList(1024)
    held = []
    for _ in range(300):
        op = rng.random()
        if op < 0.5 or not held:
            size = int(rng.integers(1, 64))
            a, b = py.take(size), nat.take(size)
            assert a == b
            if a is not None:
                held.append((a, size))
        elif op < 0.9:
            i = int(rng.integers(0, len(held)))
            off, size = held.pop(i)
            py.give(off, size)
            nat.give(off, size)
        else:
            new_cap = py.capacity + int(rng.integers(64, 256))
            py.extend(new_cap)
            nat.extend(new_cap)
        assert py.capacity == nat.capacity
        assert py.free == nat.free
        assert py.spans == nat.spans


@pytest.fixture(scope="module")
def world_dev():
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=11,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    return dev


def test_native_march_matches_xla(world_dev, rng):
    n = 512
    origins = np.stack(
        [
            rng.uniform(0, 64, n),
            rng.uniform(20, 60, n),
            rng.uniform(-10, 64, n),
        ],
        axis=1,
    ).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    nat = native.native_march(world_dev, origins, dirs)
    xla = march(world_dev, origins, dirs)

    hit_x = np.asarray(xla.hit)
    agree = nat["hit"] == hit_x
    # tiny disagreement budget for rays grazing cell boundaries (float order)
    assert agree.mean() > 0.99, agree.mean()
    both = nat["hit"] & hit_x
    np.testing.assert_allclose(
        nat["t"][both], np.asarray(xla.t)[both], atol=1e-3, rtol=1e-5
    )
    assert (nat["material"][both] == np.asarray(xla.material)[both]).mean() > 0.99


def test_native_march_misses_outside():
    w = World.generate(dims=(1, 1, 1), chunksize=16.0, depth=4, seed=0,
                       water_level=0.0)
    _, dev = w.to_device()
    o = np.array([[100.0, 100.0, 100.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)  # pointing away
    r = native.native_march(dev, o, d)
    assert not r["hit"][0] and np.isinf(r["t"][0])
