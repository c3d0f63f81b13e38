"""Differentiable-path benchmark: fwd+bwd (inverse-rendering step) at 1080p.

Regions measured (reference workload anchor: the two-march frame of
Main.cpp:196,222; BASELINE fwd+bwd target):

  march — plain march_frame of the bench rays (the forward anchor)
  geom  — segment geometry sampling (diff/segments.py, host-tiled K-phase
          single-carry marches)
  amort — optimization step over cached segments: composite + L2 loss +
          grads for every voxel parameter + Adam (the steady-state
          inverse-rendering step)
  full  — geometry + step (what a step costs when the octree changed)

WHAT THE NUMBERS MEAN (round-4 finding; docs/PERF_NOTES.md "the tunnel is
a journaling client"): this environment acknowledges work at DISPATCH and
executes it only on readback-forced materialization (~10^3-10^4x slower
than a real device; no completion fence exists — every candidate was
probed and failed, tools/diag_fence*.py).  All rates here are therefore
JOURNAL-DISPATCH rates, labeled as such — the same quantity every earlier
round actually measured.  The r2 numbers in the baseline file were
additionally distorted by closure-constant dispatch degradation and the
r3 "postfix" numbers were committed as device rates, which they are not;
both are preserved under "history" with those labels.

Set DIFF_MATERIALIZE=1 to also pay for ONE real materialization of the
amortized step (minutes of relay time) — recorded as
amort_materialize_s, the honest end-to-end cost of one step here.

Env knobs: SEGS (max segments/ray, default 32; cap saturation recorded
per-K), DIFF_TILE, BENCH_BLOCK, DIFF_ITERS (default 5).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASE_PATH = os.path.join(HERE, "bench_diff_baseline.json")


def note(msg):
    print(f"# bench_diff: {msg}", file=sys.stderr, flush=True)


def _write_json_atomic(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Region worker: one region per fresh process.
# ---------------------------------------------------------------------------

def run_region(region: str, iters: int):
    import jax
    import jax.numpy as jnp
    import optax

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.diff import composite, init_params_from_world
    from octree_raymarcher_tpu.diff.segments import sample_segments_frame
    from octree_raymarcher_tpu.ops.march_jnp import march_frame
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera

    K = int(os.environ.get("SEGS", "32"))
    tile = int(os.environ.get("DIFF_TILE", "65536"))

    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    n_rays = origins.shape[0]
    block = int(os.environ.get("BENCH_BLOCK", "128"))
    if block > 0:
        from octree_raymarcher_tpu.shade.tiling import block_permutation

        perm, _ = block_permutation(cam.height, cam.width, block)
        origins, dirs = origins[perm], dirs[perm]
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    params = init_params_from_world(world)
    target = jnp.zeros((n_rays, 3), dtype=jnp.float32)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(p, segs, tgt):
        out = composite(segs, p)
        return jnp.mean((out["rgb"] - tgt) ** 2)

    # target as a jit ARGUMENT: a closed-over device array would bake into
    # the executable and flip dispatch into per-op mode (r3 bisect,
    # tools/diag_poison.py).
    @jax.jit
    def step(p, s, segs, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(p, segs, tgt)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    def geometry():
        return sample_segments_frame(world, origins, dirs, max_segments=K,
                                     tile=tile)

    note(f"[{region}] compiling (K={K}, tile={tile})")
    t0 = time.time()
    segs = geometry()
    jax.block_until_ready(segs.slot)
    if region in ("amort", "full"):
        params, opt_state, loss = step(params, opt_state, segs, target)
        jax.block_until_ready(loss)
    if region == "march":
        res = march_frame(world, origins, dirs, tile=tile,
                          assume_resident=True)
        jax.block_until_ready(res.t)
    t_compile = time.time() - t0
    note(f"[{region}] warm ({t_compile:.1f}s); timing {iters} iters")

    iter_ms = []
    for _ in range(iters):
        t0 = time.time()
        if region == "march":
            res = march_frame(world, origins, dirs, tile=tile,
                              assume_resident=True)
            jax.block_until_ready(res.t)
        elif region == "geom":
            segs = geometry()
            jax.block_until_ready(segs.slot)
        elif region == "amort":
            params, opt_state, loss = step(params, opt_state, segs, target)
            jax.block_until_ready(loss)
        elif region == "full":
            segs = geometry()
            params, opt_state, loss = step(params, opt_state, segs, target)
            jax.block_until_ready(loss)
        else:
            raise SystemExit(f"unknown region {region!r}")
        iter_ms.append((time.time() - t0) * 1e3)

    rec = {
        "region": region, "iters": iters, "n_rays": n_rays,
        "dispatch_ms_mean": round(float(np.mean(iter_ms)), 2),
        "dispatch_ms_std": round(float(np.std(iter_ms)), 2),
        "iter_ms": [round(v, 2) for v in iter_ms],
        "t_compile_s": round(t_compile, 1),
        "max_segments": K,
    }

    if os.environ.get("DIFF_MATERIALIZE", "0") == "1" and region == "amort":
        note("[amort] materializing one step (minutes of relay time)")
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, segs, target)
        rec["materialize_loss"] = float(np.asarray(loss))
        rec["materialize_s"] = round(time.time() - t0, 1)
    if region == "geom" and os.environ.get("DIFF_STATS", "0") == "1":
        # Readback (sacrifices the process; keep strictly last).
        rec["cap_saturation_frac"] = round(
            float(np.asarray(jnp.mean((segs.count >= K).astype(jnp.float32)))), 4
        )
    print("REGION_RESULT " + json.dumps(rec), flush=True)


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def _spawn(region: str, iters: int) -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--region", region,
         "--iters", str(iters)],
        cwd=HERE, capture_output=True, text=True, timeout=7200,
    )
    sys.stderr.write(p.stderr)
    if p.returncode != 0:
        note(f"region {region} FAILED rc={p.returncode}\n{p.stdout}")
        raise SystemExit(2)
    for line in p.stdout.splitlines():
        if line.startswith("REGION_RESULT "):
            rec = json.loads(line[len("REGION_RESULT "):])
            note(f"{region}: dispatch {rec['dispatch_ms_mean']}ms "
                 f"(std {rec['dispatch_ms_std']}; wall {time.time()-t0:.0f}s)")
            return rec
    note(f"region {region}: no result\n{p.stdout}")
    raise SystemExit(2)


def main():
    iters = int(os.environ.get("DIFF_ITERS", "5"))
    K = int(os.environ.get("SEGS", "32"))

    march = _spawn("march", iters)
    geom = _spawn("geom", iters)
    amort = _spawn("amort", iters * 2)
    full = _spawn("full", iters)
    n_rays = march["n_rays"]

    def rate(rec):
        return round(n_rays / (rec["dispatch_ms_mean"] / 1e3))

    record = {
        "metric_semantics": (
            "journal-DISPATCH rates (docs/PERF_NOTES.md r4): device "
            "execution rate is unmeasurable through the axon relay; these "
            "are the same quantity every earlier round measured, now "
            "labeled correctly"),
        "fwdbwd_full_rays_per_s_1080p": rate(full),
        "fwdbwd_amortized_rays_per_s_1080p": rate(amort),
        "geometry_rays_per_s_1080p": rate(geom),
        "march_rays_per_s_1080p": rate(march),
        "full_dispatch_ms": full["dispatch_ms_mean"],
        "amortized_dispatch_ms": amort["dispatch_ms_mean"],
        "geometry_dispatch_ms": geom["dispatch_ms_mean"],
        "march_dispatch_ms": march["dispatch_ms_mean"],
        "dispatch_ms_std": {
            r["region"]: r["dispatch_ms_std"]
            for r in (march, geom, amort, full)
        },
        "max_segments": K,
    }
    for src, key in ((amort, "materialize_s"), (amort, "materialize_loss"),
                     (geom, "cap_saturation_frac")):
        if key in src:
            record[f"amort_{key}" if key.startswith("mat") else key] = src[key]

    base = json.load(open(BASE_PATH)) if os.path.exists(BASE_PATH) else {}
    if "history" not in base:
        history = {}
        if "fwdbwd_full_rays_per_s_1080p" in base:
            history["r2_dispatch_degraded_by_closure_poison"] = {
                k: v for k, v in base.items() if k != "postfix"
            }
        if "postfix" in base:
            history["r3_unverified_committed_as_device_rates"] = base["postfix"]
        base = {"history": history}
    if "fwdbwd_full_rays_per_s_1080p" not in base:
        base = {**record, "history": base.get("history", {})}
        _write_json_atomic(BASE_PATH, base)
        note("recorded this run as the labeled dispatch-rate baseline")
    cmp = base

    for metric in ("fwdbwd_full_rays_per_s_1080p",
                   "fwdbwd_amortized_rays_per_s_1080p"):
        v = record[metric]
        print(json.dumps({
            "metric": metric,
            "value": v,
            "unit": "rays/s (journal-dispatch; see PERF_NOTES r4)",
            "vs_baseline": round(v / cmp[metric], 3),
        }))
    print(
        f"# dispatch ms/frame: march={march['dispatch_ms_mean']} "
        f"geometry={geom['dispatch_ms_mean']} full={full['dispatch_ms_mean']} "
        f"amortized={amort['dispatch_ms_mean']} K={K}"
        + (f" amort_materialize_s={amort['materialize_s']}"
           if "materialize_s" in amort else ""),
        flush=True,
    )


if __name__ == "__main__":
    if "--region" in sys.argv:
        run_region(sys.argv[sys.argv.index("--region") + 1],
                   int(sys.argv[sys.argv.index("--iters") + 1]))
    else:
        main()
