"""Part 3: why is the SAME sampler executable 30,000x slower inside
bench_diff's process than in tools/diag_segments2.py?

Replicates bench_diff.py stage by stage and re-times a fixed geometry
workload (3 x 4 tile dispatches of _sample_segments_jit, K=16) after each
stage.  All timing via block_until_ready; dt floats are host-side.

Stages:
  s0  world on device only
  s1  + full-frame padded arrays built, tiles taken as device slices
  s2  + init_params_from_world + optax init
  s3  + one jitted train step executed
  s4  full sample_segments_frame(1080p) itself, timed whole

Run alone on the TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag3: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import optax

    from bench import build_world
    from octree_raymarcher_tpu.diff import composite, init_params_from_world
    from octree_raymarcher_tpu.diff.segments import (
        _sample_segments_jit,
        sample_segments_frame,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    K, tile = 16, 65536
    results = []

    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    o_host, d_host = origins[perm], dirs[perm]

    def probe(label, o_dev, d_dev, iters=3):
        """Time iters x 4 tile dispatches (tiles 0, 8, 16, 24)."""
        idx = [0, 8, 16, 24]
        outs = [
            _sample_segments_jit(world, o_dev[i * tile:(i + 1) * tile],
                                 d_dev[i * tile:(i + 1) * tile], K, 512, 8)
            for i in idx
        ]
        jax.block_until_ready(outs[-1].slot)  # warm
        t0 = time.time()
        for _ in range(iters):
            outs = [
                _sample_segments_jit(world, o_dev[i * tile:(i + 1) * tile],
                                     d_dev[i * tile:(i + 1) * tile], K, 512, 8)
                for i in idx
            ]
        jax.block_until_ready(outs[-1].slot)
        dt = (time.time() - t0) / iters
        results.append((label, dt * 1e3))
        note(f"{label}: {dt*1e3:.2f} ms / 4 tiles")

    # s0: fresh process, host tiles moved to device wholesale
    o_dev = jnp.asarray(o_host)
    d_dev = jnp.asarray(d_host)
    probe("s0 world-only, device slices", o_dev, d_dev)

    # s1: padded arrays exactly like sample_segments_frame builds them
    pad = (-o_dev.shape[0]) % tile
    o_p = jnp.concatenate([o_dev, jnp.full((pad, 3), 1e9, dtype=jnp.float32)])
    d_p = jnp.concatenate(
        [d_dev, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (pad, 3))]
    )
    probe("s1 padded-concat slices", o_p, d_p)

    # s2: params + optimizer state exist on device
    params = init_params_from_world(world)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    jax.block_until_ready(params.density_raw)
    probe("s2 after params+opt init", o_p, d_p)

    # s3: one full train step has run
    target = jnp.zeros((o_p.shape[0], 3), dtype=jnp.float32)

    def loss_fn(p, segs):
        out = composite(segs, p)
        return jnp.mean((out["rgb"] - target[: segs.slot.shape[0]]) ** 2)

    @jax.jit
    def step(p, s, segs):
        loss, grads = jax.value_and_grad(loss_fn)(p, segs)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    segs0 = _sample_segments_jit(world, o_p[:tile], d_p[:tile], K, 512, 8)
    params, opt_state, loss = step(params, opt_state, segs0)
    jax.block_until_ready(loss)
    probe("s3 after one train step", o_p, d_p)

    # s4: the full-frame helper itself
    segs = sample_segments_frame(world, o_dev, d_dev, max_segments=K, tile=tile)
    jax.block_until_ready(segs.slot)
    t0 = time.time()
    for _ in range(2):
        segs = sample_segments_frame(world, o_dev, d_dev, max_segments=K, tile=tile)
    jax.block_until_ready(segs.slot)
    dt = (time.time() - t0) / 2
    results.append(("s4 full sample_segments_frame 1080p", dt * 1e3))
    note(f"s4 full frame: {dt*1e3:.1f} ms")

    probe("s5 after full frame", o_p, d_p)

    print()
    for label, ms in results:
        print(f"{label:<40} {ms:10.2f} ms")


if __name__ == "__main__":
    main()
