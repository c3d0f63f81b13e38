"""Measure per-device worst-ray gating vs in-shard sub-tiling (VERDICT r3 #5).

The failure mode being quantified: with one while-loop per march phase over
a device's WHOLE ray shard, a single long ray gates every lane of the shard
for its full step count.  Sub-tiling the sampling (render_sharded cfg.tile,
make_sharded_train_step grad_tiles — both unrolled Python loops inside the
shard_map body, every while-loop top-level) confines the long ray's cost to
its own sub-tile.

Workload: a deliberately skewed ray set — rays that hit terrain within a
few steps, plus ONE long grazing ray per device shard (placed so every
shard gets exactly one).  Measures:

  * render_sharded, cfg.tile=0 (whole-shard loop) vs cfg.tile=TILE
  * make_sharded_train_step(overlap=False), grad_tiles=1 vs grad_tiles=G

on the available mesh (8 virtual CPU devices under JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8; or the 1 real TPU chip, where the
"mesh" is 1 device and the effect is the in-shard gating alone).

Writes tools JSON to stdout; run CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 DIAG_PLATFORM=cpu \
      python tools/diag_shard_tiling.py
or TPU (alone): python tools/diag_shard_tiling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_shard_tiling: {msg}", file=sys.stderr, flush=True)


def main():
    if os.environ.get("DIAG_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from octree_raymarcher_tpu.diff import init_params_from_world
    from octree_raymarcher_tpu.parallel.mesh import make_mesh
    from octree_raymarcher_tpu.parallel.render_sharded import (
        make_sharded_train_step,
        render_sharded,
    )
    from octree_raymarcher_tpu.shade.render import RenderConfig
    from octree_raymarcher_tpu.world.world import World

    devices = jax.devices()
    n_dev = len(devices)
    mesh = make_mesh(devices)
    note(f"mesh: {n_dev} x {devices[0].device_kind}")

    w = World.generate(dims=(4, 1, 4), chunksize=64.0, depth=6, seed=3,
                      water_level=0.0, amplitude=24.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    # Skewed ray set: per shard, SHORT rays pointing straight down onto the
    # terrain from just above it (hit in a handful of steps), plus ONE long
    # grazing ray skimming the whole world diagonally just above the
    # terrain amplitude (hundreds of steps, mostly-empty cells).
    per_shard = int(os.environ.get("DIAG_RAYS_PER_SHARD", "8192"))
    rng = np.random.default_rng(0)
    n = per_shard * n_dev
    o = np.stack([
        rng.uniform(8, 248, n), np.full(n, 40.0), rng.uniform(8, 248, n),
    ], axis=1).astype(np.float32)
    d = np.broadcast_to(np.array([0.0, -1.0, 0.0], np.float32), (n, 3)).copy()
    long_dir = np.array([1.0, 0.0, 1.0], np.float32)
    long_dir /= np.linalg.norm(long_dir)
    for s in range(n_dev):
        i = s * per_shard  # first ray of each shard becomes the long ray
        o[i] = (1.0, 25.5, 1.0)
        d[i] = long_dir
    o, d = jnp.asarray(o), jnp.asarray(d)
    eye = (128.0, 40.0, 128.0)

    def timed(fn, ready, reps=3):
        out = fn()
        jax.block_until_ready(ready(out))
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(ready(out))
        return (time.time() - t0) / reps

    tile = int(os.environ.get("DIAG_TILE", "1024"))
    out = {"devices": n_dev, "device_kind": devices[0].device_kind,
           "rays_per_shard": per_shard, "sub_tile": tile}

    # ---- forward: whole-shard loop vs sub-tiled ---------------------------
    for name, t in (("fwd_whole_shard_ms", 0), ("fwd_subtiled_ms", tile)):
        cfg = RenderConfig(shadow="none", max_steps=512, tile=t)
        fwd = jax.jit(
            lambda w_, o_, d_, cfg=cfg: render_sharded(
                mesh, w_, o_, d_, eye, cfg=cfg)
        )
        dt = timed(lambda: fwd(dev, o, d), lambda x: x)
        out[name] = round(dt * 1e3, 2)
        note(f"{name}: {out[name]} ms")
    out["fwd_speedup"] = round(out["fwd_whole_shard_ms"] /
                               max(out["fwd_subtiled_ms"], 1e-9), 2)

    # ---- train step: grad_tiles=1 vs G ------------------------------------
    params = init_params_from_world(dev, solid_density=10.0)
    targets = jnp.zeros((n, 3), dtype=jnp.float32)
    opt = optax.adam(1e-2)
    s0 = opt.init(params)
    G = max(2, per_shard // tile)
    for name, g in (("train_1tile_ms", 1), (f"train_{0}tiles_ms", G)):
        name = name if g == 1 else f"train_{G}tiles_ms"
        step = make_sharded_train_step(mesh, dev, opt, max_segments=8,
                                       overlap=False, grad_tiles=g)
        dt = timed(lambda: step(params, s0, dev, o, d, targets),
                   lambda x: x[2])
        out[name] = round(dt * 1e3, 2)
        note(f"{name}: {out[name]} ms")
    out["train_speedup"] = round(out["train_1tile_ms"] /
                                 max(out[f"train_{G}tiles_ms"], 1e-9), 2)
    out["grad_tiles"] = G

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
