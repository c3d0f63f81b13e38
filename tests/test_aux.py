"""Aux subsystem tests: metrics, config, checkpoint/resume, picking."""

import numpy as np

from octree_raymarcher_tpu.config import EngineConfig, WorldConfig
from octree_raymarcher_tpu.diff.checkpoint import load_state, save_state
from octree_raymarcher_tpu.utils.metrics import Counter, MetricsLogger
from octree_raymarcher_tpu.world.world import World
from octree_raymarcher_tpu.world.pick import cursor_box, pick


def test_counter_ring_stats():
    c = Counter(window=4)
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):   # 1.0 evicted by ring
        c.add(v)
    st = c.stats()
    assert st["n"] == 4 and st["min"] == 2.0 and st["max"] == 5.0
    assert abs(st["avg"] - 3.5) < 1e-9
    with c.time():
        pass
    assert c.stats()["n"] == 4  # ring stays at window size


def test_metrics_logger_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    m.log("frame", rays_per_s=1e9, steps_per_ray=12.5)
    m.counter("frame_ms").add(16.6)
    m.close()
    import json
    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "frame" and rec["rays_per_s"] == 1e9


def test_engine_config_roundtrip():
    cfg = EngineConfig(world=WorldConfig(dims=(2, 1, 2), depth=6))
    cfg2 = EngineConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert hash(cfg2) is not None  # usable as a jit static arg


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    params = {"density": jnp.arange(12.0).reshape(3, 4), "albedo": jnp.ones((3, 3))}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    p = str(tmp_path / "ckpt.npz")
    save_state(p, 42, params, opt_state)
    step, params2, opt_state2 = load_state(p, params, opt_state)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(params2["density"]), np.asarray(params["density"]))
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt_state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pick_targets_surface():
    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=12.0)
    r = pick(w, origin=(16.0, 30.0, 16.0), direction=(0.0, -1.0, 0.0))
    assert r is not None and r.hit
    assert 0.0 <= r.point[1] <= 30.0
    bmin, bmax = cursor_box(r)
    assert np.all(bmax > bmin)
    # picking into empty sky misses
    assert pick(w, origin=(16.0, 30.0, 16.0), direction=(0.0, 1.0, 0.0)) is None
