"""Localize the serialized-gather trigger in the K-phase segment sampler.

bench_diff measured geometry at ~122 s/frame (serialized regime) while the
plain march frame runs at ~34 ms — yet both use the same single-carry while
loop.  This times one 65536-ray tile through structural variants between
those two points to find which construct flips the gathers:

  A  march alone (one while loop in the module)
  B  march with a t_start vector argument (resume path, still one loop)
  C  two chained marches, phase-style glue between them (two loops)
  D  sample_segments K=2
  E  sample_segments K=4
  F  K=4 with each phase its own jitted dispatch (host-chained)

Run alone on the TPU (CLAUDE.md: one TPU process at a time).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def note(msg):
    print(f"# diag: {msg}", file=sys.stderr, flush=True)


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
    print(f"{label:<40} {dt*1e3:10.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.core.geometry import escape_distance, inv_dir
    from octree_raymarcher_tpu.diff.segments import sample_segments
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
    o = jnp.asarray(origins[perm][:tile])
    d = jnp.asarray(dirs[perm][:tile])
    jax.block_until_ready(world.tree)
    note("world + tile ready")

    # A: plain march, one loop
    @jax.jit
    def A(w, o, d):
        r = march(w, o, d, 512)
        return r.t

    timed("A march alone", A, world, o, d)

    # B: march with a vector t_start argument (resume path)
    @jax.jit
    def B(w, o, d, t0):
        r = march(w, o, d, 512, t_start=t0, live_start=jnp.ones(o.shape[0], jnp.int32))
        return r.t

    timed("B march resume(t_start arg)", B, world, o, d,
          jnp.zeros(tile, jnp.float32))

    # C: two chained marches with phase glue
    @jax.jit
    def C(w, o, d):
        g = inv_dir(d)
        r0 = march(w, o, d, 512)
        hit0 = r0.hit
        t_hit = jnp.where(hit0, r0.t, 0.0)
        p = o + d * t_hit[:, None]
        esc = escape_distance(p, g, r0.cell_bmin, r0.cell_bmin + r0.cell_size[:, None])
        t_cur = jnp.where(hit0, t_hit + esc + 1e-4, 0.0)
        r1 = march(w, o, d, 512, t_start=t_cur, live_start=hit0.astype(jnp.int32))
        return r0.t + r1.t

    timed("C two chained marches", C, world, o, d)

    # D/E: the real sampler at K=2 / K=4
    fD = jax.jit(lambda w, o, d: sample_segments(w, o, d, 2).t1.sum())
    timed("D sample_segments K=2", fD, world, o, d)
    fE = jax.jit(lambda w, o, d: sample_segments(w, o, d, 4).t1.sum())
    timed("E sample_segments K=4", fE, world, o, d)

    # F: K=4 but each phase its own dispatch (host-chained)
    @jax.jit
    def phase0(w, o, d):
        r = march(w, o, d, 512)
        return r.hit, r.t, r.cell_bmin, r.cell_size, r.texel, r.material

    @jax.jit
    def phasek(w, o, d, t_cur, live):
        r = march(w, o, d, 512, t_start=t_cur, live_start=live)
        return r.hit, r.t, r.cell_bmin, r.cell_size, r.texel, r.material

    @jax.jit
    def glue(o, d, hit, t, cbm, csz):
        g = inv_dir(d)
        t_hit = jnp.where(hit, t, 0.0)
        p = o + d * t_hit[:, None]
        esc = escape_distance(p, g, cbm, cbm + csz[:, None])
        t1 = t_hit + esc
        return jnp.where(hit, t1 + 1e-4, 0.0), hit.astype(jnp.int32), t1

    def F(w, o, d):
        hit, t, cbm, csz, tex, mat = phase0(w, o, d)
        acc = t
        for _ in range(3):
            t_cur, live, t1 = glue(o, d, hit, t, cbm, csz)
            hit, t, cbm, csz, tex, mat = phasek(w, o, d, t_cur, live)
            acc = acc + t1
        return acc

    timed("F K=4 host-chained phases", F, world, o, d)


if __name__ == "__main__":
    main()
