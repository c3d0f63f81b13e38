"""march_tiled must be bit-identical to the untiled marcher (same rays,
same while-loop semantics — only the batching differs)."""

import numpy as np

from octree_raymarcher_tpu.ops.march_jnp import march, march_tiled
from octree_raymarcher_tpu.world.world import World


def test_tiled_equals_untiled(rng):
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    n = 1000   # not a multiple of the tile -> exercises padding
    origins = np.stack(
        [rng.uniform(-10, 74, n), rng.uniform(5, 60, n), rng.uniform(-10, 74, n)],
        axis=1,
    ).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    r1 = march(dev, origins, dirs)
    r2 = march_tiled(dev, origins, dirs, tile=256)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_array_equal(np.asarray(r1.material), np.asarray(r2.material))
    np.testing.assert_allclose(
        np.asarray(r1.t)[np.asarray(r1.hit)],
        np.asarray(r2.t)[np.asarray(r2.hit)],
        rtol=0, atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(r1.cell_bmin), np.asarray(r2.cell_bmin)
    )
