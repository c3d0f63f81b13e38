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


def test_march_frame_live_start_and_delegation(rng):
    """march_frame's live_start path (new in r4: the eager-delegation
    target for big-batch march_tiled calls, e.g. the shadow-ray pass)
    must match march() with the same live mask, and eager march_tiled on
    a big batch must produce identical results via its delegation."""
    from octree_raymarcher_tpu.ops.march_jnp import march_frame

    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    n = 700
    origins = np.stack(
        [rng.uniform(-10, 74, n), rng.uniform(5, 60, n), rng.uniform(-10, 74, n)],
        axis=1,
    ).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    live = (rng.uniform(size=n) < 0.6).astype(np.int32)

    ref = march(dev, origins, dirs, live_start=live)
    got = march_frame(dev, origins, dirs, tile=256, live_start=live)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    # dead rays report a miss
    assert not np.asarray(got.hit)[live == 0].any()

    # eager big-batch march_tiled == march_frame (the delegation)
    d1 = march_tiled(dev, origins, dirs, tile=256, live_start=live)
    np.testing.assert_array_equal(np.asarray(d1.t), np.asarray(got.t))
    d2 = march_tiled(dev, origins, dirs, tile=256)
    f2 = march_frame(dev, origins, dirs, tile=256)
    np.testing.assert_array_equal(np.asarray(d2.t), np.asarray(f2.t))


def test_steps_aov_coarse_bounds_exact(rng):
    """steps_aov='coarse' (staged fast loop) must bound the exact counter:
    exact <= coarse < exact + stride, with identical hit/t results."""
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    n = 512
    origins = np.stack(
        [rng.uniform(-10, 74, n), rng.uniform(5, 60, n), rng.uniform(-10, 74, n)],
        axis=1,
    ).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    exact = march(dev, origins, dirs, steps_aov=True)
    coarse = march(dev, origins, dirs, steps_aov="coarse", steps_stride=8)

    np.testing.assert_array_equal(np.asarray(exact.hit), np.asarray(coarse.hit))
    np.testing.assert_array_equal(
        np.asarray(exact.t)[np.asarray(exact.hit)],
        np.asarray(coarse.t)[np.asarray(exact.hit)],
    )
    es = np.asarray(exact.steps)
    cs = np.asarray(coarse.steps)
    assert (cs >= es).all(), (es[cs < es], cs[cs < es])
    # A ray that goes dead at the start of a stage is not counted by the
    # exact counter for that iteration but the stage still charges it, so
    # the overcount can reach exactly the stride.
    assert (cs <= es + 8).all(), int((cs - es).max())


def test_assume_resident_matches_default_on_static_world(rng):
    """assume_resident=True (skips per-step residency gathers — what
    bench.py runs) must be bit-identical on a static world."""
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    n = 600
    origins = np.stack(
        [rng.uniform(-10, 74, n), rng.uniform(5, 60, n), rng.uniform(-10, 74, n)],
        axis=1,
    ).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    r1 = march(dev, origins, dirs)
    r2 = march(dev, origins, dirs, assume_resident=True)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_array_equal(np.asarray(r1.material), np.asarray(r2.material))
    np.testing.assert_array_equal(np.asarray(r1.t), np.asarray(r2.t))
    np.testing.assert_array_equal(np.asarray(r1.texel), np.asarray(r2.texel))
