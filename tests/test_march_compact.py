"""march_frame_compact must be BIT-IDENTICAL to march_frame (same kernel,
same cells — only the lane schedule differs), and its executed-lane
accounting must beat the uncompacted schedule on a skewed ray set."""

import numpy as np

from octree_raymarcher_tpu.ops.march_compact import march_frame_compact
from octree_raymarcher_tpu.ops.march_jnp import march_frame, march_tiled
from octree_raymarcher_tpu.world.world import World


def _world():
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=3,
                       water_level=0.0, amplitude=2.0)
    _, dev = w.to_device()
    return dev


def _skewed_rays(rng, n):
    """Mostly short down-rays hitting terrain fast, a few long grazers
    weaving just above the surface (many fine-cell steps)."""
    o = np.stack([rng.uniform(2, 62, n), np.full(n, 24.0),
                  rng.uniform(2, 62, n)], axis=1).astype(np.float32)
    d = np.broadcast_to(np.array([0.0, -1.0, 0.0], np.float32), (n, 3)).copy()
    for k, i in enumerate(range(0, n, max(1, n // 4))):
        # long grazers skimming the near-flat surface band (probed:
        # ~61 fine-cell steps each on this scene) at staggered heights
        o[i] = (0.5, 3.0 + 0.1 * k, 0.5)
        d[i] = np.array([1.0, 0.004, 1.0], np.float32)
        d[i] /= np.linalg.norm(d[i])
    # and some misses (upward)
    d[1::7] = np.array([0.0, 1.0, 0.0], np.float32)
    return o, d


def test_compact_bit_identical_to_plain(rng):
    dev = _world()
    n = 1500   # not a tile multiple -> exercises padding
    o, d = _skewed_rays(rng, n)

    ref = march_frame(dev, o, d, max_steps=256, tile=256)
    got, executed = march_frame_compact(dev, o, d, max_steps=256, tile=256,
                                        stride=16)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.material),
                                  np.asarray(got.material))
    np.testing.assert_array_equal(np.asarray(ref.cell_bmin),
                                  np.asarray(got.cell_bmin))
    np.testing.assert_array_equal(np.asarray(ref.cell_size),
                                  np.asarray(got.cell_size))
    np.testing.assert_array_equal(np.asarray(ref.texel), np.asarray(got.texel))

    # Lane accounting: the compacted schedule must execute (weakly) fewer
    # lane-iterations than the uncompacted one, whose cost per tile is
    # gated by that tile's worst ray (computed from the exact steps AOV,
    # stage-quantized the same way).
    ex = np.asarray(
        march_tiled(dev, o, d, max_steps=256, tile=256, steps_aov=True).steps
    )
    pad = (-n) % 256
    sp = np.concatenate([ex, np.zeros(pad, np.int64)]).reshape(-1, 256)
    per_tile = np.ceil(sp.max(axis=1) / 16) * 16
    uncompacted = int((per_tile * 256).sum())
    assert int(executed) <= uncompacted, (int(executed), uncompacted)
    # On this skewed set the win must be real, not epsilon.
    assert int(executed) < 0.8 * uncompacted, (int(executed), uncompacted)


def test_compact_live_start(rng):
    """Caller-masked rays (the shadow-ray use) behave identically."""
    dev = _world()
    n = 700
    o, d = _skewed_rays(rng, n)
    live = (np.arange(n) % 3 != 0).astype(np.int32)
    ref = march_frame(dev, o, d, max_steps=128, tile=256, live_start=live)
    got, _ = march_frame_compact(dev, o, d, max_steps=128, tile=256,
                                 stride=16, live_start=live)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.texel), np.asarray(got.texel))


def test_compact_custom_schedule(rng):
    """A mixed-stride schedule (fine early, coarse late — the shipping
    default shape) stays bit-identical as long as it covers exactly the
    plain march's effective iterations."""
    dev = _world()
    n = 600
    o, d = _skewed_rays(rng, n)
    ref = march_frame(dev, o, d, max_steps=256, tile=128)
    got, _ = march_frame_compact(dev, o, d, max_steps=256, tile=128,
                                 schedule=(16, 16, 32, 64, 128))
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.cell_size),
                                  np.asarray(got.cell_size))


def test_compact_schedule_validation():
    import pytest

    from octree_raymarcher_tpu.ops.march_compact import default_schedule

    dev = _world()
    o = np.zeros((8, 3), np.float32)
    d = np.tile(np.array([[0, -1, 0]], np.float32), (8, 1))
    with pytest.raises(ValueError):
        march_frame_compact(dev, o, d, max_steps=256, schedule=(16, 16))
    with pytest.raises(ValueError):
        march_frame_compact(dev, o, d, max_steps=64, stride=13)
    # default schedules always validate and cover the budget exactly
    for ms in (64, 130, 256, 512, 640):
        sched = default_schedule(ms, 16)
        assert sum(-(-s // 4) * 4 for s in sched) == -(-ms // 4) * 4


def test_compact_steps_are_coarse_counts(rng):
    """The steps AOV is no longer silent zeros (VERDICT r4 weak #1): it
    carries the coarse charge, bounded below by the exact count and above
    by exact + the largest stage bound."""
    dev = _world()
    n = 512
    o, d = _skewed_rays(rng, n)
    sched = (16,) * 8 + (32,) * 4
    exact = np.asarray(
        march_tiled(dev, o, d, max_steps=256, tile=256, steps_aov=True).steps
    )
    got, _ = march_frame_compact(dev, o, d, max_steps=256, tile=256,
                                 schedule=sched)
    coarse = np.asarray(got.steps)
    assert (coarse >= exact).all()
    assert (coarse <= exact + max(sched)).all()


def test_compact_matches_on_assume_resident(rng):
    dev = _world()
    n = 512
    o, d = _skewed_rays(rng, n)
    ref = march_frame(dev, o, d, max_steps=128, tile=128,
                      assume_resident=True)
    got, _ = march_frame_compact(dev, o, d, max_steps=128, tile=128,
                                 stride=16, assume_resident=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
