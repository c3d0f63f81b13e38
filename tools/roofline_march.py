"""Lane accounting + gather-bound roofline for the march (VERDICT r1 #9,
r4 #3/#4/#6).

The 1080p march is not FLOP- or HBM-stream-bound: its cost is the issue
rate of per-lane gathers inside a single-int32-carry while loop (the fast
regime of docs/PERF_NOTES.md).  Timing through the axon tunnel measures
only journal-dispatch acks (no execution fence exists — PERF_NOTES r4), so
the LOAD-BEARING output of this tool is timing-free: executed
lane-iterations and lane utilization, counted on device from the steps AOV
and the compact schedule's own accounting.

Legs (--legs camera,compact,shadow,sampler — default all):
  camera   synthetic gather-SoL loops + the bench-config march, the
           per-tile utilization curve, perfect-compaction ceilings, and
           ceilings for candidate stage SCHEDULES (host math over the
           one steps-AOV readback).
  compact  ACHIEVED utilization of march_frame_compact on the real 1080p
           frame for a (schedule x tile) sweep, with per-config cold wall
           time of the first stage dispatch (= trace+compile through the
           tunnel) and launch counts — the reproducible artifact VERDICT
           r4 #6 demanded (the r4 numbers lived only in PERF_NOTES prose).
  shadow   lane accounting for the 512^2 shadow-map bundle (the frame's
           second march, reference Main.cpp:190-198) — uncompacted vs
           compacted; funds the frame_total_lane_iters entry.
  sampler  per-phase lane accounting for the K=32 segment sampler (the
           training frame's geometry pass) — uncompacted vs the
           stage-compacted sampler (diff/segments_compact.py).

EXECUTION DISCIPLINE: every leg only DISPATCHES work and keeps device
scalars; ALL device->host readbacks happen in one finalize block at the
very end of the process.  The first readback permanently flips later
dispatches into per-op sync through the tunnel (docs/PERF_NOTES.md), so a
mid-run readback would turn the later legs' thousands of dispatches into
hours of relay time.  Results merge into roofline_march.json.

Run alone (never concurrently with another TPU process — CLAUDE.md).
Env: ROOFLINE_TILES (compact-sweep tiles, default "65536,32768"),
ROOFLINE_SAMPLER_K (default 32), ROOFLINE_LEGS overrides --legs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

STRIDE = 16
MAX_STEPS = int(os.environ.get("ROOFLINE_MAX_STEPS", "512"))
TILE = int(os.environ.get("ROOFLINE_TILE", "65536"))
SMOKE = os.environ.get("ROOFLINE_SMOKE", "0") == "1"  # tiny world+rays on CPU


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


def _camera_rays():
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    if SMOKE:
        cam = PerspectiveCamera(
            position=(32.0, 24.0, -16.0), yaw_deg=0.0, pitch_deg=-15.0,
            fov_deg=80.0, width=128, height=72,
        )
        origins, dirs = cam.rays()
        perm, _ = block_permutation(cam.height, cam.width, 8)
        return jnp.asarray(origins[perm]), jnp.asarray(dirs[perm])
    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    return jnp.asarray(origins[perm]), jnp.asarray(dirs[perm])


def _coarse_steps_tiled(world, origins, dirs, tile=TILE, max_steps=MAX_STEPS):
    """Per-ray coarse step counts + per-tile executed lanes, counted ON
    DEVICE (host tiling with ONE jitted per-tile executable — never eager
    lax.map, whose constant-pool closure poisons the process).  Returns
    device values: (steps_parts list, executed scalar, true scalar)."""
    import functools

    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.ops.march_jnp import march

    @functools.partial(jax.jit, static_argnames=("ms",))
    def tile_steps(w, o, d, ms):
        r = march(w, o, d, ms, steps_aov="coarse", steps_stride=STRIDE,
                  assume_resident=True, _check_const_pools=False)
        # executed lanes in this tile = tile_width * the worst surviving
        # ray's charge (= the sum of every stage's actual trip count)
        return r.steps, jnp.max(r.steps) * o.shape[0], jnp.sum(r.steps)

    import jax.numpy as jnp

    n = origins.shape[0]
    pad = (-n) % tile
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.full((pad, 3), 1e9, jnp.float32)])
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0., 1., 0.], jnp.float32),
                                    (pad, 3))])
    steps_parts, executed, true = [], None, None
    for i in range(0, origins.shape[0], tile):
        s, e, t = tile_steps(world, origins[i:i + tile], dirs[i:i + tile],
                             max_steps)
        steps_parts.append(s)
        executed = e if executed is None else executed + e
        true = t if true is None else true + t
    return steps_parts, executed, true


# ---------------------------------------------------------------------------
# Dispatch legs: device work only, NO readbacks.  Each returns a pending
# record consumed by the finalize block.
# ---------------------------------------------------------------------------

def leg_camera_dispatch(world, origins, dirs):
    import jax

    from octree_raymarcher_tpu.ops.march_jnp import march_tiled

    depth = world.depth
    n_rays = origins.shape[0]

    @jax.jit
    def frame(w, o, d):
        r = march_tiled(w, o, d, max_steps=MAX_STEPS, tile=TILE,
                        assume_resident=True)
        return r.hit, r.t

    note("timing bench-config march (dispatch acks)")
    dt_march, _ = time_iters_per_s(frame, (world, origins, dirs))

    pool_elems = 1 << int(np.ceil(np.log2(max(world.tree.shape[0], 2))))
    note(f"synthetic loops (pool={pool_elems} words, tile={TILE})")
    g1 = synthetic_loop_rate(TILE, 1, 0, pool_elems, 256)
    gm = synthetic_loop_rate(TILE, depth + 1, 3, pool_elems, 256)

    note("dispatching coarse steps AOV")
    import jax.numpy as jnp

    steps_parts, _, _ = _coarse_steps_tiled(world, origins, dirs)
    # ONE device array -> ONE readback-materialization later
    steps_dev = jnp.concatenate(steps_parts)
    return dict(dt_march=dt_march, g1=g1, gm=gm, steps_dev=steps_dev,
                depth=depth, n_rays=n_rays)


def leg_compact_dispatch(world, origins, dirs):
    from octree_raymarcher_tpu.ops.march_compact import (
        default_schedule,
        march_frame_compact,
    )

    tiles = [int(t) for t in os.environ.get(
        "ROOFLINE_TILES", "65536,32768").split(",") if t]
    pending = []
    for tile in tiles:
        for name, sched in (
            ("uniform16", (STRIDE,) * (MAX_STEPS // STRIDE)),
            ("default16", default_schedule(MAX_STEPS, 16)),
        ):
            key = f"tile{tile}_{name}"
            note(f"compact sweep {key} ({len(sched)} stages)")
            t0 = time.time()
            res, executed = march_frame_compact(
                world, origins, dirs, MAX_STEPS, tile=tile,
                assume_resident=True, schedule=sched,
            )
            # wall time of the dispatch chain (cold = trace+compile through
            # the tunnel; NOT device time; no readback here)
            cold_s = time.time() - t0
            pending.append((key, len(sched), cold_s, executed, res.hit))
    return pending


def leg_shadow_dispatch(world, world_host):
    import jax.numpy as jnp

    from octree_raymarcher_tpu.ops.march_compact import march_frame_compact
    from octree_raymarcher_tpu.shade.lights import LightRig
    from octree_raymarcher_tpu.shade.render import shadow_bundle

    rig = LightRig.default()
    # world center from the HOST copy of the pools (never read back the
    # device copy) — the exact translation _shadowmap_device applies.
    cs = float(world_host.chunksize)
    lo = np.asarray(world_host.chunkcoordmin, dtype=np.float64) * cs
    res = 64 if SMOKE else 512
    origins_rel, dirs, _, extent_half = shadow_bundle(
        np.asarray(rig.directional.direction, np.float64), res, res,
        world_host.dims, cs,
    )
    center = lo + np.asarray(extent_half, np.float64)
    origins = jnp.asarray((origins_rel + center[None, :]).astype(np.float32))
    dirs = jnp.asarray(dirs)

    note("shadow bundle: dispatching coarse AOV accounting + compact march")
    _, executed_dev, true_dev = _coarse_steps_tiled(world, origins, dirs)
    _, comp_dev = march_frame_compact(world, origins, dirs, MAX_STEPS,
                                      tile=TILE, assume_resident=True)
    # The SHIPPED compact shadow config (render_shadowmap compact_tile
    # default): a finer tile attacks exactly the short-ray/long-grazer
    # granularity waste the coarse-tile record shows (util 0.124 at 65536).
    ship_tile = int(os.environ.get("SHADOW_COMPACT_TILE", "8192"))
    ship_tile = min(ship_tile, int(origins.shape[0]))
    _, ship_dev = march_frame_compact(world, origins, dirs, MAX_STEPS,
                                      tile=ship_tile, assume_resident=True)
    return dict(rays=int(origins.shape[0]), executed=executed_dev,
                true=true_dev, comp=comp_dev, ship=ship_dev,
                ship_tile=ship_tile)


def leg_sampler_dispatch(world, origins, dirs):
    import functools

    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.core.geometry import inv_dir
    from octree_raymarcher_tpu.diff.segments import _extract_jit
    from octree_raymarcher_tpu.diff.segments_compact import (
        sample_segments_compact,
    )
    from octree_raymarcher_tpu.ops.march_jnp import march

    K = int(os.environ.get("ROOFLINE_SAMPLER_K", "32"))
    n = origins.shape[0]
    tile = TILE
    pad = (-n) % tile
    o = jnp.concatenate([origins, jnp.full((pad, 3), 1e9, jnp.float32)])
    d = jnp.concatenate(
        [dirs, jnp.broadcast_to(jnp.asarray([0., 1., 0.], jnp.float32),
                                (pad, 3))])
    g = inv_dir(d)
    twig_slots = int(world.twig.shape[0])

    @functools.partial(jax.jit, static_argnames=())
    def phase_tile(w, o_, d_, t_cur, live):
        r = march(w, o_, d_, MAX_STEPS, steps_aov="coarse",
                  steps_stride=STRIDE, t_start=t_cur, live_start=live,
                  assume_resident=True, _check_const_pools=False)
        ex = jnp.max(r.steps) * o_.shape[0]
        return (r.hit, r.t, r.cell_bmin, r.cell_size, r.texel, r.material,
                ex, jnp.sum(r.steps), jnp.sum(live))

    note(f"sampler: dispatching {K} uncompacted instrumented phases "
         f"({o.shape[0] // tile} tiles each)")
    t_cur = jnp.zeros(o.shape[0], jnp.float32)
    live = jnp.ones(o.shape[0], jnp.int32)
    first = True
    per_phase = []
    for _k in range(K):
        ex_k = tr_k = lv_k = None
        fields = []
        for i in range(0, o.shape[0], tile):
            sl = slice(i, i + tile)
            hit, t, cbm, csz, tex, mat, ex, tr, lv = phase_tile(
                world, o[sl], d[sl],
                None if first else t_cur[sl], live[sl])
            fields.append((hit, t, cbm, csz, tex, mat))
            ex_k = ex if ex_k is None else ex_k + ex
            tr_k = tr if tr_k is None else tr_k + tr
            lv_k = lv if lv_k is None else lv_k + lv
        hit = jnp.concatenate([f[0] for f in fields])
        t = jnp.concatenate([f[1] for f in fields])
        cbm = jnp.concatenate([f[2] for f in fields])
        csz = jnp.concatenate([f[3] for f in fields])
        tex = jnp.concatenate([f[4] for f in fields])
        mat = jnp.concatenate([f[5] for f in fields])
        _, _, _, t_next, hi = _extract_jit(o, d, g, hit, t, cbm, csz, tex,
                                           mat, twig_slots, 8)
        t_cur, live = t_next, hi
        first = False
        per_phase.append((ex_k, tr_k, lv_k))

    note("sampler: dispatching compacted run")
    _, comp_exec = sample_segments_compact(
        world, origins, dirs, max_segments=K, max_steps=MAX_STEPS,
        tile=tile, stride=STRIDE, assume_resident=True,
    )
    # stack all the accounting scalars into TWO device arrays so finalize
    # pays two readback-materializations, not ~4K
    per_phase_dev = jnp.stack(
        [jnp.stack([p[0] for p in per_phase]),
         jnp.stack([p[1] for p in per_phase]),
         jnp.stack([p[2] for p in per_phase])],
        axis=1,
    )  # [K, 3] int32: executed, true, live
    comp_exec_dev = jnp.stack(comp_exec)
    return dict(K=K, n=n, per_phase_dev=per_phase_dev,
                comp_exec_dev=comp_exec_dev)


# ---------------------------------------------------------------------------
# Finalize: ALL readbacks + host math + JSON merge.
# ---------------------------------------------------------------------------

def finalize_camera(pend, out):
    import jax

    n_rays = pend["n_rays"]
    note("readback: steps AOV")
    steps = np.asarray(jax.block_until_ready(pend["steps_dev"]))[:n_rays]

    def util_at(t):
        pad_ = (-n_rays) % t
        sp = np.concatenate([steps, np.zeros(pad_, np.int32)]).reshape(-1, t)
        trips = np.ceil(sp.max(axis=1) / STRIDE) * STRIDE
        executed = float((trips * t).sum())
        return float(steps.sum()) / executed, executed

    lane_util, executed_lane_iters = util_at(TILE)
    true_ray_steps = float(steps.sum())  # upper estimate (quantized up)
    dt_march = pend["dt_march"]
    achieved_iters_per_s = executed_lane_iters / dt_march
    util_curve = {
        str(t): round(util_at(t)[0], 3)
        for t in (2048, 8192, 16384, 32768, 65536, 262144, n_rays)
    }

    def schedule_ceiling(schedule, t):
        """Perfect-compaction executed lanes under a stage schedule: the
        stage with bound b starting at step c runs ceil(live/t)*t*b lanes,
        live = rays with steps > c."""
        executed = 0.0
        c = 0
        for b in schedule:
            live = int((steps > c).sum())
            if live == 0:
                break
            executed += np.ceil(live / t) * t * b
            c += b
        return true_ray_steps / max(executed, 1.0)

    from octree_raymarcher_tpu.ops.march_compact import default_schedule

    compaction_curve = {
        str(t): round(
            schedule_ceiling((STRIDE,) * (MAX_STEPS // STRIDE), t), 3)
        for t in (8192, 65536)
    }
    schedules = {
        "uniform16": (STRIDE,) * (MAX_STEPS // STRIDE),
        "uniform32": (32,) * (MAX_STEPS // 32),
        "default(16)": default_schedule(MAX_STEPS, 16),
        "default(8)": default_schedule(MAX_STEPS, 8),
    }
    sched_ceil = {
        name: {
            "stages": len(s),
            "ceiling_tile65536": round(schedule_ceiling(s, 65536), 3),
            "ceiling_tile32768": round(schedule_ceiling(s, 32768), 3),
            "ceiling_tile8192": round(schedule_ceiling(s, 8192), 3),
        }
        for name, s in schedules.items()
    }

    frac = achieved_iters_per_s / pend["gm"]
    out.update({
        "lane_utilization": round(lane_util, 3),
        "lane_utilization_vs_tile": util_curve,
        "lane_utilization_perfect_compaction": compaction_curve,
        "schedule_ceilings": sched_ceil,
        "executed_lane_iters_per_frame": executed_lane_iters,
        "true_ray_steps_per_frame": true_ray_steps,
        "gathers_per_iter": pend["depth"] + 4,
        "invalid_dispatch_ack_timings": {
            "rays_per_s_march_only": round(n_rays / dt_march),
            "frame_ms_march_only": round(dt_march * 1e3, 2),
            "achieved_lane_iters_per_s": round(achieved_iters_per_s),
            "sol_iters_per_s_12gather": round(pend["gm"]),
            "sol_iters_per_s_1gather": round(pend["g1"]),
            "march_pct_of_gather_sol": round(100 * frac, 1),
        },
    })


def finalize_compact(pending, out):
    import jax

    true = out.get("true_ray_steps_per_frame")
    sweep = {}
    for key, stages, cold_s, executed, hit in pending:
        jax.block_until_ready(hit)
        ex = int(executed)
        rec = {
            "schedule_stages": stages,
            "launches_per_frame": stages + 2,
            "executed_lane_iters": ex,
            "cold_wall_s_trace_compile_dispatch": round(cold_s, 1),
        }
        if true:
            rec["achieved_utilization"] = round(true / max(ex, 1), 3)
        if out.get("executed_lane_iters_per_frame"):
            rec["lane_work_vs_uncompacted"] = round(
                out["executed_lane_iters_per_frame"] / max(ex, 1), 2)
        sweep[key] = rec
        note(f"compact {key}: {json.dumps(rec)}")
    out["compact_achieved"] = sweep


def finalize_shadow(pend, out):
    executed, true, comp = (int(pend["executed"]), int(pend["true"]),
                            int(pend["comp"]))
    ship = int(pend["ship"])
    out["shadow_pass"] = {
        "rays": pend["rays"],
        "max_steps": MAX_STEPS,
        "executed_lane_iters_uncompacted": executed,
        "true_ray_steps": true,
        "lane_utilization_uncompacted": round(true / max(executed, 1), 3),
        # compact at the camera march's tile (granularity-limited on a
        # short-ray bundle) vs at the SHIPPED render_shadowmap compact
        # tile — the config render_frame(compact=True) actually runs.
        "executed_lane_iters_compact": comp,
        "lane_utilization_compact": round(true / max(comp, 1), 3),
        "compact_tile": TILE,
        "shipped_compact_tile": pend["ship_tile"],
        "executed_lane_iters_compact_shipped": ship,
        "lane_utilization_compact_shipped": round(true / max(ship, 1), 3),
    }
    note(f"shadow: {json.dumps(out['shadow_pass'])}")


def finalize_sampler(pend, out):
    import jax

    note("readback: sampler per-phase scalars")
    n = pend["n"]
    pp = np.asarray(jax.block_until_ready(pend["per_phase_dev"]))
    comp = np.asarray(jax.block_until_ready(pend["comp_exec_dev"]))
    phases = []
    tot_ex = tot_tr = 0
    for k in range(pp.shape[0]):
        ex, tr, lv = int(pp[k, 0]), int(pp[k, 1]), int(pp[k, 2])
        tot_ex += ex
        tot_tr += tr
        phases.append({"phase": k, "live": lv, "executed": ex, "true": tr})
    comp_total = int(comp.astype(np.int64).sum())
    out["sampler"] = {
        "K": pend["K"],
        "rays": n,
        "max_steps": MAX_STEPS,
        "executed_lane_iters_uncompacted": tot_ex,
        "true_ray_steps": tot_tr,
        "lane_utilization_uncompacted": round(tot_tr / max(tot_ex, 1), 3),
        "executed_lane_iters_compact": comp_total,
        "lane_utilization_compact": round(tot_tr / max(comp_total, 1), 3),
        "live_frac_per_phase": [
            round(p["live"] / max(n, 1), 4) for p in phases
        ],
        "per_phase": phases,
    }
    note(f"sampler totals: uncompacted {tot_ex}, compact {comp_total}, "
         f"true {tot_tr}")


def main():
    # Runnable as `python tools/roofline_march.py` from anywhere: put the
    # repo root (not tools/) on sys.path without touching PYTHONPATH (which
    # breaks the axon plugin — CLAUDE.md).
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default=os.environ.get(
        "ROOFLINE_LEGS", "camera,compact,shadow,sampler"))
    args = ap.parse_args()
    legs = [s.strip() for s in args.legs.split(",") if s.strip()]

    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    note("building world + rays")
    if SMOKE:
        from octree_raymarcher_tpu.world.world import World

        w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=5, seed=7,
                           water_level=4.0, amplitude=16.0)
        _, world_host = w.to_device()
    else:
        from bench import build_world

        world_host = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world_host)
    origins, dirs = _camera_rays()
    jax.block_until_ready(world.tree)

    path = os.path.join(os.path.dirname(__file__), "..",
                        "roofline_march.json")
    if SMOKE:
        path = "/tmp/roofline_smoke.json"
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    out["semantics"] = (
        "lane counts (executed_lane_iters / utilization) are device-counted "
        "and timing-free — the valid efficiency metric on this harness; "
        "every *timing* field is a journal-DISPATCH ack (no execution "
        "fence exists on this tunnel) — see docs/PERF_NOTES.md r4")
    out["device"] = jax.devices()[0].device_kind

    # ---- dispatch everything (no readbacks) -------------------------------
    pend = {}
    if "camera" in legs:
        pend["camera"] = leg_camera_dispatch(world, origins, dirs)
    if "compact" in legs:
        pend["compact"] = leg_compact_dispatch(world, origins, dirs)
    if "shadow" in legs:
        pend["shadow"] = leg_shadow_dispatch(world, world_host)
    if "sampler" in legs:
        pend["sampler"] = leg_sampler_dispatch(world, origins, dirs)

    # ---- finalize: every readback happens here, after all dispatch -------
    note("finalize: reading back all counts (relay materialization; slow)")
    if "camera" in pend:
        finalize_camera(pend["camera"], out)
    if "compact" in pend:
        finalize_compact(pend["compact"], out)
    if "shadow" in pend:
        finalize_shadow(pend["shadow"], out)
    if "sampler" in pend:
        finalize_sampler(pend["sampler"], out)

    # Whole-frame totals (VERDICT r4 #4): camera + shadow march lanes.
    cam_un = out.get("executed_lane_iters_per_frame")
    sh = out.get("shadow_pass")
    comp = out.get("compact_achieved", {})
    cam_c = min(
        (v["executed_lane_iters"] for v in comp.values()), default=None
    )
    if cam_un and sh:
        total = {
            "uncompacted": int(cam_un) + sh["executed_lane_iters_uncompacted"],
        }
        if cam_c:
            # shipped config = render_frame(compact=True): camera compact +
            # the compact shadow map at its finer shipped tile (falls back
            # to the camera-tile shadow record for pre-r5 JSONs).
            sh_c = sh.get("executed_lane_iters_compact_shipped",
                          sh["executed_lane_iters_compact"])
            total["compact"] = cam_c + sh_c
            total["frame_lane_work_ratio"] = round(
                total["uncompacted"] / total["compact"], 2)
        out["frame_total_lane_iters"] = total

    lane = out.get("lane_utilization")
    out["mfu_statement"] = (
        "timing-based MFU is unmeasurable through this tunnel; lockstep "
        f"lane utilization is {round(100 * (lane or 0), 1)}% uncompacted at "
        f"tile {TILE} and the compact schedule's achieved values are under "
        "compact_achieved — counted, not timed")

    print(json.dumps(out, indent=1))
    with open(path + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    os.replace(path + ".tmp", path)
    note(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
