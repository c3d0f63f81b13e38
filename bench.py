"""Headline benchmark: forward raymarch+shade throughput at 1080p.

Workload mirrors the reference's default scene (Main.cpp:38,80): a 4x4x4
chunk grid of 128^3-voxel octrees (512^3 addressable voxels, depth 8) from
simplex terrain, rendered through a 1920x1080 perspective camera.  Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

WHAT THE NUMBER MEANS (round-4 finding; full story in docs/PERF_NOTES.md
"the tunnel is a journaling client"): this harness environment reaches its
TPU through a relay that acknowledges work at DISPATCH and actually
executes it only when a device->host readback forces materialization,
which then runs ~10^3-10^4x slower than a directly-attached device
(measured: a 1080p march frame = ~24 ms of dispatch acks, ~245 s of
forced materialization, correct pixels either way).  No completion fence
exists (block_until_ready, is_ready, callbacks, flush kicks, idle waits —
all probed, tools/diag_fence*.py).  Device-side execution rate is
therefore UNMEASURABLE here.  The headline metric is the JOURNAL-DISPATCH
rate — the same quantity rounds 1-3 actually measured (so vs_baseline
stays comparable) — now labeled as such, never claimed as device time.
Set BENCH_MATERIALIZE=1 to additionally measure one frame's true
end-to-end materialization (costs ~4 min of relay time; written to the
modes JSON as materialize_s).

Timing rules inside a worker: block_until_ready only (readback acks would
flip the process into per-op dispatch); per-iteration blocked times give
the spread (VERDICT r3 #4); each mode runs in a fresh subprocess so modes
cannot contaminate each other (and compile order is fixed).

Env knobs: BENCH_ITERS (default 10), BENCH_TILE, BENCH_BLOCK,
BENCH_RESIDENT, BENCH_MODES=0 to skip the mode table, BENCH_MATERIALIZE=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def note(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def build_world():
    from octree_raymarcher_tpu.world.device import DeviceWorld
    from octree_raymarcher_tpu.world.world import World

    # Reference default scene: 4x4x4 chunks x 128^3 voxels, depth 8, with the
    # water flood (Main.cpp:80, World.cpp:11,316-321).  The packed pools are
    # cached on disk (~30 s to rebuild, scene is deterministic in the seed).
    cache = os.path.join(HERE, ".bench_world.npz")
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            z["tree"]
        except Exception:
            os.remove(cache)
            return build_world()
        return DeviceWorld(
            tree=z["tree"], twig=z["twig"], twig_occ=z["twig_occ"],
            chunk_bmin=z["chunk_bmin"], chunk_tree=z["chunk_tree"],
            chunk_twig=z["chunk_twig"], chunkcoordmin=z["chunkcoordmin"],
            chunksize=float(z["chunksize"]), dims=tuple(int(v) for v in z["dims"]),
            depth=int(z["depth"]),
        )
    w = World.generate(dims=(4, 4, 4), chunksize=128.0, depth=8, seed=0,
                       water_level=6.0, amplitude=64.0)
    _, dev = w.to_device(slack=1.0, device=False)
    # atomic write so an interrupted run can't leave a corrupt cache
    np.savez(
        cache + ".tmp.npz",
        tree=dev.tree, twig=dev.twig, twig_occ=dev.twig_occ,
        chunk_bmin=dev.chunk_bmin, chunk_tree=dev.chunk_tree,
        chunk_twig=dev.chunk_twig, chunkcoordmin=dev.chunkcoordmin,
        chunksize=dev.chunksize, dims=np.asarray(dev.dims), depth=dev.depth,
    )
    os.replace(cache + ".tmp.npz", cache)
    return dev


# ---------------------------------------------------------------------------
# Worker: one mode per fresh process.
# ---------------------------------------------------------------------------

def run_mode(mode: str, iters: int):
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render_frame

    t_setup = time.time()
    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)
    t_world = time.time() - t_setup

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    n_rays = origins.shape[0]
    # Screen-block ray order: spatially-coherent rays share march tiles so
    # each tile's loop exits at a local worst ray (same compiled executable —
    # the permutation is host-side data movement only).
    block = int(os.environ.get("BENCH_BLOCK", "128"))
    if block > 0:
        from octree_raymarcher_tpu.shade.tiling import block_permutation

        perm, _ = block_permutation(cam.height, cam.width, block)
        origins, dirs = origins[perm], dirs[perm]
    eye = jnp.asarray(cam.position, dtype=jnp.float32)
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    resident = os.environ.get("BENCH_RESIDENT", "1") == "1"
    tile = int(os.environ.get("BENCH_TILE", "65536"))
    kw = {}
    if mode == "plain":
        cfg = RenderConfig(shadow="none", max_steps=512, assume_resident=resident)
    elif mode == "plain_fused":
        # one executable per frame instead of ~2 dispatches per tile
        cfg = RenderConfig(shadow="none", max_steps=512, assume_resident=resident)
        kw = dict(fused=True)
    elif mode == "shadow_map":
        # two marches/frame: 512^2-ray light-depth pass + screen pass
        cfg = RenderConfig(shadow="map", max_steps=512, assume_resident=resident)
    elif mode == "shadow_ray":
        # two full-screen marches: camera rays + per-hit shadow rays
        cfg = RenderConfig(shadow="ray", max_steps=512, assume_resident=resident)
    elif mode == "plain_compact":
        # stage-compacted march schedule: ~3x fewer executed march lanes
        # (the lane cost is read back at the end of this worker)
        cfg = RenderConfig(shadow="none", max_steps=512, assume_resident=resident)
        kw = dict(compact=True)
    elif mode in ("full_frame", "full_frame_fused", "full_frame_compact"):
        # the full reference frame: shadowed + atlas-textured + env sky
        from octree_raymarcher_tpu.shade.atlas import default_atlas
        from octree_raymarcher_tpu.shade.envmap import default_envmap

        cfg = RenderConfig(shadow="map", max_steps=512, assume_resident=resident)
        kw = dict(atlas=jnp.asarray(default_atlas(resolution=32)),
                  envmap=jnp.asarray(default_envmap(64, 128)),
                  fused=mode.endswith("fused"),
                  compact=mode.endswith("compact"))
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    def frame(w, o, d):
        return render_frame(w, o, d, eye, cfg=cfg, tile=tile, **kw)["rgb"]

    note(f"[{mode}] world {t_world:.1f}s; compiling (cache: .jax_cache)")
    t0 = time.time()
    out = jax.block_until_ready(frame(world, origins, dirs))
    t_compile = time.time() - t0
    note(f"[{mode}] first frame {t_compile:.1f}s; timing {iters} iters")

    iter_ms = []
    for _ in range(iters):
        t0 = time.time()
        out = jax.block_until_ready(frame(world, origins, dirs))
        iter_ms.append((time.time() - t0) * 1e3)

    rec = {
        "mode": mode, "iters": iters, "n_rays": n_rays,
        "dispatch_ms_mean": round(float(np.mean(iter_ms)), 2),
        "dispatch_ms_min": round(min(iter_ms), 2),
        "dispatch_ms_std": round(float(np.std(iter_ms)), 2),
        "iter_ms": [round(v, 2) for v in iter_ms],
        "t_compile_s": round(t_compile, 1),
    }

    if kw.get("compact"):
        # Executed-lane cost of the compacted schedule: the one valid
        # device-efficiency metric on this harness (counted on device; the
        # int() is this worker's only readback, strictly after all timing).
        full = render_frame(world, origins, dirs, eye, cfg=cfg, tile=tile,
                            **kw)
        rec["executed_lane_iters"] = int(
            jax.block_until_ready(full["lane_iters"])
        )

    if os.environ.get("BENCH_MATERIALIZE", "0") == "1":
        # One frame's true end-to-end cost: readback-forced materialization
        # through the relay.  The process is sacrificial after this.
        note(f"[{mode}] materializing one frame (takes minutes)")
        t0 = time.time()
        out = frame(world, origins, dirs)
        sink = float(np.asarray(jnp.sum(out)))
        rec["materialize_s"] = round(time.time() - t0, 1)
        rec["sink"] = sink
        sky = np.asarray(RenderConfig().sky)
        if mode == "plain":
            rec["hit_frac"] = round(
                1.0 - float(np.isclose(np.asarray(out), sky).all(-1).mean()), 3
            )
    print("MODE_RESULT " + json.dumps(rec), flush=True)


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

def _spawn(mode: str, iters: int) -> dict:
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--mode", mode,
         "--iters", str(iters)],
        cwd=HERE, capture_output=True, text=True, timeout=7200,
    )
    sys.stderr.write(p.stderr)
    if p.returncode != 0:
        note(f"mode {mode} FAILED rc={p.returncode}\n{p.stdout}")
        raise SystemExit(2)
    for line in p.stdout.splitlines():
        if line.startswith("MODE_RESULT "):
            rec = json.loads(line[len("MODE_RESULT "):])
            note(f"{mode}: dispatch {rec['dispatch_ms_mean']}ms/frame "
                 f"(std {rec['dispatch_ms_std']}) "
                 f"(worker wall {time.time()-t0:.0f}s)")
            return rec
    note(f"mode {mode}: no result\n{p.stdout}")
    raise SystemExit(2)


def main():
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t_all = time.time()

    pa = _spawn("plain", iters)
    pb = _spawn("plain", iters)  # repeat run: run-to-run spread of the mean
    n_rays = pa["n_rays"]
    dt = pa["dispatch_ms_mean"] / 1e3
    spread_pct = abs(pb["dispatch_ms_mean"] - pa["dispatch_ms_mean"]) / max(
        pa["dispatch_ms_mean"], 1e-9) * 100
    rays_per_s = n_rays / dt

    modes = {}
    if os.environ.get("BENCH_MODES", "1") == "1":
        for mode in ("plain_fused", "plain_compact", "shadow_map",
                     "shadow_ray", "full_frame", "full_frame_fused",
                     "full_frame_compact"):
            m = _spawn(mode, iters)
            modes[mode] = {
                "rays_per_s": round(n_rays / (m["dispatch_ms_mean"] / 1e3)),
                "frame_ms": m["dispatch_ms_mean"],
                "std_ms": m["dispatch_ms_std"],
                "iter_ms": m["iter_ms"],
            }
            for k in ("materialize_s", "executed_lane_iters"):
                if k in m:
                    modes[mode][k] = m[k]

    baseline_path = os.path.join(HERE, "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = rays_per_s
        json.dump(
            {"metric": "fwd_rays_per_s_1080p", "value": rays_per_s},
            open(baseline_path, "w"),
        )
    print(
        json.dumps(
            {
                "metric": "fwd_rays_per_s_1080p",
                "value": round(rays_per_s),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / base, 3),
            }
        )
    )
    print(
        f"# frame={dt*1e3:.1f}ms/frame dispatch rate (repeat run "
        f"{pb['dispatch_ms_mean']}ms, spread {spread_pct:.1f}%; per-iter std "
        f"{pa['dispatch_ms_std']}ms) — journal-dispatch metric, see "
        f"docs/PERF_NOTES.md r4; total_wall={time.time()-t_all:.0f}s",
        flush=True,
    )
    if modes:
        for name, rec in modes.items():
            print(f"# mode {name}: {rec['rays_per_s']/1e6:.1f}M rays/s "
                  f"({rec['frame_ms']} ms/frame)", flush=True)
        modes["plain"] = {
            "rays_per_s": round(rays_per_s),
            "frame_ms": pa["dispatch_ms_mean"],
            "frame_ms_repeat_run": pb["dispatch_ms_mean"],
            "run_spread_pct": round(spread_pct, 1),
            "std_ms": pa["dispatch_ms_std"],
            "iter_ms": pa["iter_ms"],
        }
        for k in ("materialize_s", "hit_frac"):
            if k in pa:
                modes["plain"][k] = pa[k]
        modes["_meta"] = {
            "resolution": "1920x1080",
            "note": ("shadow_map/full_frame = reference two-march frame "
                     "(Main.cpp:190-235); full_frame adds atlas texturing + "
                     "equirect env sky"),
            "metric_semantics": (
                "frame_ms = journal-DISPATCH rate through the axon relay "
                "(the quantity r1-r3 measured); device execution rate is "
                "unmeasurable in this environment — no completion fence "
                "exists and readback-forced materialization runs ~10^4x "
                "slow (measured 245 s/frame; docs/PERF_NOTES.md r4). "
                "materialize_s, when present, is that end-to-end cost. "
                "executed_lane_iters (compact modes) is device-COUNTED, "
                "timing-free march work; full_frame_compact's count covers "
                "the WHOLE frame — camera march + the compact shadow-map "
                "bundle at its shipped tile."),
        }
        tmp = os.path.join(HERE, "bench_frame_modes.json.tmp")
        with open(tmp, "w") as f:
            json.dump(modes, f, indent=1)
        os.replace(tmp, os.path.join(HERE, "bench_frame_modes.json"))


if __name__ == "__main__":
    if "--mode" in sys.argv:
        run_mode(sys.argv[sys.argv.index("--mode") + 1],
                 int(sys.argv[sys.argv.index("--iters") + 1]))
    else:
        main()
