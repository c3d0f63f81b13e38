"""Differentiable-path benchmark: fwd+bwd (inverse-rendering step) throughput.

BASELINE target: forward+backward rays/s at 1080p on one chip.  One step =
soft-composite render of the cached ray segments + L2 loss + gradients for
every voxel parameter + Adam update (the geometry sampling is amortized
across steps, as in diff/optim.py — re-sampled only when the octree changes).

Prints one JSON line {"metric": "fwdbwd_rays_per_s_1080p", ...}.  Timing
rules as bench.py: no device->host readback inside the timed region.
"""

from __future__ import annotations

import json
import sys
import time


def note(msg):
    print(f"# bench_diff: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.diff import (
        composite,
        init_params_from_world,
        sample_segments,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera

    t0 = time.time()
    note("building world")
    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)
    note(f"world on device ({time.time()-t0:.1f}s)")

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    n_rays = origins.shape[0]
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    note("sampling segments (geometry pass)")
    t0 = time.time()
    segs = jax.block_until_ready(
        jax.jit(lambda o, d: sample_segments(world, o, d, max_segments=16))(
            origins, dirs
        )
    )
    note(f"segments ready ({time.time()-t0:.1f}s)")

    params = init_params_from_world(world)
    target = jnp.zeros((n_rays, 3), dtype=jnp.float32)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = composite(segs, p)
        return jnp.mean((out["rgb"] - target) ** 2)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    note("compiling fwd+bwd step")
    t0 = time.time()
    compiled = step.lower(params, opt_state).compile()
    note(f"compiled ({time.time()-t0:.1f}s); warmup")
    params, opt_state, loss = compiled(params, opt_state)
    jax.block_until_ready(loss)
    note("timing")

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = compiled(params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "metric": "fwdbwd_rays_per_s_1080p",
        "value": round(n_rays / dt),
        "unit": "rays/s",
        "step_ms": round(dt * 1e3, 1),
        "final_loss": float(loss),
    }))


if __name__ == "__main__":
    main()
