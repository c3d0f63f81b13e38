"""sample_segments_compact must be segment-for-segment IDENTICAL to
sample_segments (same march, same extraction formulas — only the lane
schedule differs), and its per-phase lane accounting must be sane."""

import numpy as np

from octree_raymarcher_tpu.diff.segments import sample_segments
from octree_raymarcher_tpu.diff.segments_compact import sample_segments_compact
from octree_raymarcher_tpu.world.world import World


def _world():
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=2.0, amplitude=8.0)
    _, dev = w.to_device()
    return dev


def _rays(rng, n):
    """Mix of steep hitters, grazers crossing many cells, and misses."""
    o = np.stack([rng.uniform(2, 62, n), np.full(n, 30.0),
                  rng.uniform(2, 62, n)], axis=1).astype(np.float32)
    d = np.stack([rng.uniform(-0.3, 0.3, n), np.full(n, -1.0),
                  rng.uniform(-0.3, 0.3, n)], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    for i in range(0, n, max(1, n // 5)):
        o[i] = (0.5, 4.0, 0.5)
        d[i] = np.array([1.0, -0.02, 0.9], np.float32)
        d[i] /= np.linalg.norm(d[i])
    d[2::9] = np.array([0.0, 1.0, 0.0], np.float32)  # misses
    return o, d


def test_compact_sampler_identical_to_plain(rng):
    dev = _world()
    n = 900  # not a tile multiple -> exercises padding
    o, d = _rays(rng, n)
    K = 6

    ref = sample_segments(dev, o, d, max_segments=K, max_steps=256)
    got, executed = sample_segments_compact(dev, o, d, max_segments=K,
                                            max_steps=256, tile=256,
                                            stride=16)
    np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(got.count))
    np.testing.assert_array_equal(np.asarray(ref.slot), np.asarray(got.slot))
    np.testing.assert_array_equal(np.asarray(ref.t0), np.asarray(got.t0))
    # exact t1 too: both samplers run the SAME compiled extraction
    # executable (segments.py _extract_jit), so the fma-contracted
    # epilogue rounds identically
    np.testing.assert_array_equal(np.asarray(ref.t1), np.asarray(got.t1))

    assert len(executed) == K
    ex = [int(v) for v in executed]
    assert ex[0] > 0
    # the live set only shrinks across phases, so no later phase may
    # execute more lanes than the first
    assert max(ex[1:]) <= ex[0]


def test_compact_sampler_mixed_schedule(rng):
    dev = _world()
    n = 300
    o, d = _rays(rng, n)
    ref = sample_segments(dev, o, d, max_segments=3, max_steps=128)
    got, _ = sample_segments_compact(dev, o, d, max_segments=3,
                                     max_steps=128, tile=128,
                                     schedule=(16, 16, 32, 64))
    np.testing.assert_array_equal(np.asarray(ref.slot), np.asarray(got.slot))
    np.testing.assert_array_equal(np.asarray(ref.t1), np.asarray(got.t1))


def test_fit_with_compact_sampler_identical(rng):
    """The shipped training surface: fit(compact=True) pre-samples through
    the stage-compacted sampler and must produce the bit-identical loss
    trajectory (same segments -> same compositing -> same Adam updates)."""
    import jax.numpy as jnp

    from octree_raymarcher_tpu.diff.composite import VoxelParams
    from octree_raymarcher_tpu.diff.optim import fit, sample_views

    dev = _world()
    n = 300
    o, d = _rays(rng, n)
    target = np.clip(rng.uniform(0, 1, (n, 3)), 0, 1).astype(np.float32)
    views = [(o, d, target)]

    c0 = sample_views(dev, views, max_segments=4, max_steps=128, tile=128)
    c1 = sample_views(dev, views, max_segments=4, max_steps=128, tile=128,
                      compact=True)
    for (s0, _), (s1, _) in zip(c0, c1):
        np.testing.assert_array_equal(np.asarray(s0.slot), np.asarray(s1.slot))
        np.testing.assert_array_equal(np.asarray(s0.t0), np.asarray(s1.t0))
        np.testing.assert_array_equal(np.asarray(s0.t1), np.asarray(s1.t1))

    slots = int(dev.twig.shape[0])
    p0 = VoxelParams(
        density=jnp.full((slots, 64), 2.0, jnp.float32),
        albedo=jnp.full((slots, 64, 3), 0.5, jnp.float32),
    )
    _, h0 = fit(dev, views, p0, steps=3, max_segments=4)
    _, h1 = fit(dev, views, p0, steps=3, max_segments=4, compact=True)
    # fit() samples at its own defaults (max_steps 512, tile 65536); both
    # samplers see the same rays, so histories must agree exactly
    assert h0 == h1
