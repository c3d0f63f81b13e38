"""Part 2: isolate the slow-regime trigger in the K-phase sampler.

bench_diff shows ~3.9 s/tile at K=16 on the 1080p frame; diag_segments
showed 0.09 ms at K=4 on the first (sky) tile.  Scan K x tile-content:

  * tiles: sky (block 0) vs ground (a middle block with ~100% hit)
  * K: 1, 2, 4, 8, 16
  * plus plain march on both tiles for the fast-regime reference.

If ground-tile time scales ~linearly in K at ~fast-march cost, the sampler
is fine and the frame cost is just (phases x marches).  If there is a cliff
at some K (or ground tiles are uniformly ~1000x slower), the executable
fell out of the vectorized-gather regime and the cliff parameters matter.

Run alone on the TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def note(msg):
    print(f"# diag2: {msg}", file=sys.stderr, flush=True)


def timed(label, fn, *args, iters=3):
    import jax

    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    note(f"{label}: compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label:<36} {dt*1e3:10.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.diff.segments import _sample_segments_jit
    from octree_raymarcher_tpu.ops.march_jnp import march
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    tile = 65536
    op, dp = origins[perm], dirs[perm]
    tiles = {
        "sky": (jnp.asarray(op[:tile]), jnp.asarray(dp[:tile])),
        # bottom-middle of the frame: ground, ~100% hit
        "ground": (jnp.asarray(op[16 * tile:17 * tile]),
                   jnp.asarray(dp[16 * tile:17 * tile])),
    }
    jax.block_until_ready(world.tree)

    @jax.jit
    def plain(w, o, d):
        return march(w, o, d, 512).t

    for name, (o, d) in tiles.items():
        timed(f"march {name}", plain, world, o, d)

    for name, (o, d) in tiles.items():
        for K in (1, 2, 4, 8, 16):
            timed(f"segments {name} K={K}",
                  lambda w, o, d, K=K: _sample_segments_jit(w, o, d, K, 512, 8).t1.sum(),
                  world, o, d)


if __name__ == "__main__":
    main()
