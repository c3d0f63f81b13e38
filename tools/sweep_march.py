"""March-kernel tuning sweep on the real TPU: tile size x unroll x screen
block, on the bench.py 1080p workload.  Also reports steps-AOV statistics so
throughput can be compared against the gather speed-of-light.

Readback discipline (docs/PERF_NOTES.md): every timed run happens before the
FIRST device->host readback; per-config stats are kept as device arrays and
printed only at the very end.

Usage: python tools/sweep_march.py  (from the repo root; TPU must be idle)
"""

from __future__ import annotations

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def note(msg):
    print(f"# sweep: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.ops.march_jnp import march_tiled
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)
    note("world on device")

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    n_rays = origins.shape[0]

    perms = {}
    for block in (0, 64, 128, 256):
        if block == 0:
            perms[block] = None
        else:
            p, _ = block_permutation(cam.height, cam.width, block)
            perms[block] = p

    tiles = [int(v) for v in os.environ.get(
        "SWEEP_TILES", "8192,16384,32768,65536").split(",")]
    unrolls = [int(v) for v in os.environ.get("SWEEP_UNROLLS", "4").split(",")]
    blocks = [int(v) for v in os.environ.get("SWEEP_BLOCKS", "0,64,128,256").split(",")]
    iters = int(os.environ.get("SWEEP_ITERS", "2"))

    results = []  # (tile, unroll, block, dt_s, device stats)
    compiled_cache = {}

    for tile, unroll in itertools.product(tiles, unrolls):
        def f(o, d, tile=tile, unroll=unroll):
            # steps_aov="coarse": the staged fast loop counts steps
            # (quantized up to steps_stride) at ~1x cost, so the stats
            # columns are real without distorting the timing ~100x the way
            # the exact multi-carry counter would (ADVICE r1).
            r = march_tiled(world, o, d, 512, tile=tile, unroll=unroll,
                            steps_aov="coarse", steps_stride=8)
            # on-device stats only; no readback here
            return (r.hit.astype(jnp.int32).sum(), r.steps.sum(),
                    jnp.percentile(r.steps.astype(jnp.float32),
                                   jnp.asarray([50.0, 90.0, 99.0, 100.0])))
        for block in blocks:
            p = perms[block]
            o = origins if p is None else origins[p]
            d = dirs if p is None else dirs[p]
            o, d = jnp.asarray(o), jnp.asarray(d)
            key = (tile, unroll)
            t0 = time.time()
            if key not in compiled_cache:
                note(f"compile tile={tile} unroll={unroll}")
                compiled_cache[key] = jax.jit(f).lower(o, d).compile()
                note(f"  compiled in {time.time()-t0:.1f}s")
            fn = compiled_cache[key]
            out = jax.block_until_ready(fn(o, d))  # warmup
            t0 = time.time()
            for _ in range(iters):
                out = fn(o, d)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / iters
            results.append((tile, unroll, block, dt, out))
            note(f"tile={tile} unroll={unroll} block={block}: "
                 f"{dt*1e3:.0f} ms  {n_rays/dt/1e3:.0f} krays/s")

    # ---- all timing done; readbacks now -----------------------------------
    print(f"{'tile':>7} {'unr':>3} {'blk':>4} {'ms':>8} {'krays/s':>8} "
          f"{'hit%':>5} {'steps/ray':>9} {'p50/p90/p99/max':>20}")
    for tile, unroll, block, dt, (nhit, ssum, pct) in results:
        pct = np.asarray(pct)
        print(f"{tile:>7} {unroll:>3} {block:>4} {dt*1e3:>8.0f} "
              f"{n_rays/dt/1e3:>8.0f} {100*float(nhit)/n_rays:>5.1f} "
              f"{float(ssum)/n_rays:>9.1f} "
              f"{pct[0]:>5.0f}/{pct[1]:.0f}/{pct[2]:.0f}/{pct[3]:.0f}")


if __name__ == "__main__":
    main()
