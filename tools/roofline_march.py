"""Gather-bound roofline for the march loop (VERDICT r1 #9).

The 1080p march is not FLOP- or HBM-stream-bound: its cost is the issue
rate of per-lane gathers inside a single-int32-carry while loop (the fast
regime of docs/PERF_NOTES.md).  So "speed of light" here = the iteration
rate of a loop that does NOTHING but the same gather pattern as the march
body and the minimal carry update:

  * ``assume_resident`` march body gathers / iteration (ops/march_jnp.py):
      2  chunk offset columns   (chunk_tree[ci], chunk_twig[ci])
      D+1 tree words            (unrolled dependent descent chain)
      1  twig occupancy word
    = D+12-9... = (D+1)+3 = 12 for depth 8.
    The tree-descent gathers are a *dependent* chain (each address needs
    the previous word); the synthetic loop reproduces that dependence.

This tool measures, on the real TPU:
  1. SoL: iterations/s of the synthetic 12-gather single-carry loop at the
     bench tile size (and a 1-gather loop for the per-gather cost).
  2. Achieved: executed lane-iterations/s of the actual 1080p bench frame,
     counted with the coarse steps AOV (per-tile trip counts: each tile
     runs to ITS max live ray, so executed lanes = sum over tiles of
     tile_width * stage-quantized max steps).
  3. Lane utilization: sum of true per-ray steps / executed lane-iters
     (lockstep waste).

Prints a JSON summary; paste the headline into docs/PERF_NOTES.md.

Run alone (never concurrently with another TPU process — CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def note(msg):
    print(f"# roofline: {msg}", file=sys.stderr, flush=True)


def time_iters_per_s(fn, args, iters=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def synthetic_loop_rate(tile: int, n_gathers_dep: int, n_gathers_indep: int,
                        pool_elems: int, max_steps: int):
    """Iterations/s of a single-int32-carry while loop whose body performs
    ``n_gathers_dep`` chained (address-dependent) gathers plus
    ``n_gathers_indep`` independent gathers into an int32 pool of
    ``pool_elems`` elements, mirroring the march body's memory pattern."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.integers(0, 1 << 20, size=pool_elems, dtype=np.int64).astype(np.int32)
    )
    state0 = jnp.asarray(
        rng.integers(0, pool_elems, size=tile, dtype=np.int64).astype(np.int32)
    )
    mask = pool_elems - 1
    assert pool_elems & mask == 0, "pool_elems must be a power of two"

    @jax.jit
    def run(pool, state0):
        def body(s):
            state, step = s
            w = state
            # dependent chain: each address derives from the previous word
            for _ in range(n_gathers_dep):
                w = pool[(w + state) & mask]
            acc = w
            for k in range(n_gathers_indep):
                acc = acc + pool[(state + k * 1297) & mask]
            # fold the gathered data into the carry so nothing is DCE'd
            state = state + 1 + (acc & 1)
            return (state, step + 1)

        def cond(s):
            return s[1] < max_steps

        state, _ = jax.lax.while_loop(cond, body, (state0, jnp.int32(0)))
        return state

    dt, _ = time_iters_per_s(run, (pool, state0))
    return tile * max_steps / dt  # lane-iterations / s


def main():
    # Runnable as `python tools/roofline_march.py` from anywhere: put the
    # repo root (not tools/) on sys.path without touching PYTHONPATH (which
    # breaks the axon plugin — CLAUDE.md).
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.ops.march_jnp import march_tiled
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    tile = 65536
    max_steps = 512
    stride = 16

    note("building world + rays")
    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    depth = world.depth
    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    origins = jnp.asarray(origins[perm])
    dirs = jnp.asarray(dirs[perm])
    n_rays = origins.shape[0]
    jax.block_until_ready(world.tree)

    # --- 1. the march itself (bench configuration, no shading) -------------
    @jax.jit
    def frame(w, o, d):
        r = march_tiled(w, o, d, max_steps=max_steps, tile=tile,
                        assume_resident=True)
        return r.hit, r.t

    note("timing bench-config march")
    dt_march, _ = time_iters_per_s(frame, (world, origins, dirs))
    rays_per_s = n_rays / dt_march

    # --- 2. synthetic speed-of-light loops ----------------------------------
    # MUST run before any device->host readback: through the axon tunnel the
    # first readback permanently degrades dispatch, and a while-loop-heavy
    # synthetic loop timed after it would be ~1000x slow — inflating
    # march_pct_of_gather_sol to garbage (docs/PERF_NOTES.md readback curse).
    pool_elems = 1 << int(np.ceil(np.log2(max(world.tree.shape[0], 2))))
    note(f"synthetic loops (pool={pool_elems} words, tile={tile})")
    g1 = synthetic_loop_rate(tile, 1, 0, pool_elems, 256)
    # march body: depth+1 dependent tree gathers, 3 independent
    # (chunk_tree, chunk_twig, twig_occ)
    gm = synthetic_loop_rate(tile, depth + 1, 3, pool_elems, 256)

    # --- 3. executed lane-iterations via the coarse steps AOV --------------
    # (separate untimed pass; its np.asarray is the process's FIRST readback,
    # so it comes strictly after every timed region)
    @jax.jit
    def frame_steps(w, o, d):
        r = march_tiled(w, o, d, max_steps=max_steps, tile=tile,
                        assume_resident=True, steps_aov="coarse",
                        steps_stride=stride)
        return r.steps

    note("counting executed iterations (coarse steps AOV; first readback)")
    steps = np.asarray(jax.block_until_ready(frame_steps(world, origins, dirs)))

    def util_at(t):
        """Lane utilization if the SAME ray order were marched in tiles of
        t rays — pure host math over the measured per-ray step counts, so
        the whole tile-size curve costs one AOV readback."""
        pad_ = (-n_rays) % t
        sp = np.concatenate([steps, np.zeros(pad_, np.int32)]).reshape(-1, t)
        trips = np.ceil(sp.max(axis=1) / stride) * stride
        executed = float((trips * t).sum())
        return float(steps.sum()) / executed, executed

    lane_util, executed_lane_iters = util_at(tile)
    true_ray_steps = float(steps.sum())  # upper estimate (quantized up)
    achieved_iters_per_s = executed_lane_iters / dt_march
    util_curve = {
        str(t): round(util_at(t)[0], 3)
        for t in (2048, 8192, 16384, 32768, 65536, 262144, n_rays)
    }
    note(f"lane utilization vs tile size: {util_curve}")

    # Ray-compaction potential (also pure host math): if live rays were
    # re-packed densely at every stage boundary (stable sort by liveness —
    # legal between the top-level staged loops, state is one int32/ray),
    # stage s executes ceil(live_s / tile) * tile * stride lanes instead
    # of every tile that contains ANY live ray.  This bounds what a
    # compaction pass could recover on this ray set.
    def compaction_util(t):
        executed = 0.0
        s = 0
        while True:
            live = int((steps > s).sum())
            if live == 0:
                break
            executed += np.ceil(live / t) * t * stride
            s += stride
        return true_ray_steps / executed

    compaction_curve = {
        str(t): round(compaction_util(t), 3) for t in (8192, 65536)
    }
    note(f"perfect-compaction utilization: {compaction_curve}")

    # r4 semantics (docs/PERF_NOTES.md "Round 4"): the timing-derived
    # fields are journal-dispatch acks, not device time — this tool's own
    # first run proved it (march "at" 889% of the synthetic SoL).  They
    # are kept under invalid_dispatch_ack_timings for the record; the
    # valid, timing-independent result is lane_utilization, counted from
    # the steps AOV.
    frac = achieved_iters_per_s / gm
    out = {
        "semantics": ("timing fields are dispatch acks (no execution "
                      "fence exists on this tunnel); lane_utilization is "
                      "the valid metric — see docs/PERF_NOTES.md r4"),
        "lane_utilization": round(lane_util, 3),
        "lane_utilization_vs_tile": util_curve,
        "lane_utilization_perfect_compaction": compaction_curve,
        "executed_lane_iters_per_frame": executed_lane_iters,
        "gathers_per_iter": depth + 4,
        "device": jax.devices()[0].device_kind,
        "invalid_dispatch_ack_timings": {
            "rays_per_s_march_only": round(rays_per_s),
            "frame_ms_march_only": round(dt_march * 1e3, 2),
            "achieved_lane_iters_per_s": round(achieved_iters_per_s),
            "sol_iters_per_s_12gather": round(gm),
            "sol_iters_per_s_1gather": round(g1),
            "march_pct_of_gather_sol": round(100 * frac, 1),
        },
        "mfu_statement": (
            "timing-based MFU is unmeasurable through this tunnel; "
            f"lockstep lane utilization is {round(100 * lane_util, 1)}% at "
            f"tile {tile} — the remaining lever is finer tiles / ray "
            "compaction, at the cost of more dispatches"),
    }
    print(json.dumps(out, indent=1))
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "roofline_march.json")
    with open(path + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(path + ".tmp", path)
    note(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
