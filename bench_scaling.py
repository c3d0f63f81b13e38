"""Multi-device scaling benchmark: ray-sharded render throughput vs mesh size.

Measures forward rays/s for 1..N devices on the `rays` mesh axis (SURVEY.md
section 2.8: DP over screen tiles, octree replicated) and reports scaling
efficiency vs linear.  On a single-chip host, run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py

On a real pod slice, run under jax.distributed (parallel/mesh.py
init_distributed) and the same code paths scale across hosts over ICI/DCN.
Prints one JSON line per mesh size plus a summary efficiency line.

NOTE: on the virtual CPU mesh the efficiency number is mechanical only —
all virtual devices share one host's cores (XLA already multithreads the
1-device case), so speedup cannot exceed ~1x.  Real efficiency requires
real chips.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from octree_raymarcher_tpu.parallel.mesh import make_mesh
    from octree_raymarcher_tpu.parallel.render_sharded import pad_rays, render_sharded
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.world.world import World

    devices = jax.devices()
    w = World.generate(dims=(2, 1, 2), chunksize=64.0, depth=6, seed=0,
                       water_level=6.0, amplitude=32.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    cam = PerspectiveCamera(
        position=(64.0, 50.0, -40.0), pitch_deg=-15.0, fov_deg=70.0,
        width=128, height=72,
    )
    origins, dirs = cam.rays()
    eye = (64.0, 50.0, -40.0)

    sizes = [n for n in (1, 8, 64) if n <= len(devices)]
    results = {}
    for n in sizes:
        mesh = make_mesh(devices[:n])
        o, d, nr = pad_rays(origins, dirs, n)
        from octree_raymarcher_tpu.shade.render import RenderConfig
        cfg = RenderConfig(shadow="none", max_steps=128)
        f = lambda o_, d_: render_sharded(mesh, dev, o_, d_, eye, cfg=cfg)
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        out = jax.block_until_ready(f(o, d))           # compile + warm
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            out = f(o, d)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        rays_per_s = origins.shape[0] / dt
        results[n] = rays_per_s
        print(json.dumps({
            "metric": "fwd_rays_per_s_sharded", "devices": n,
            "value": round(rays_per_s), "unit": "rays/s",
        }), flush=True)

    if len(results) > 1:
        base = results[sizes[0]]
        worst = min(
            results[n] / (base * n / sizes[0]) for n in sizes[1:]
        )
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(worst, 3),
            "unit": "fraction_of_linear",
            "devices": sizes[-1],
            "platform": devices[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
