"""Ground-truth timing probe: is jax.block_until_ready an execution fence
through the axon tunnel?  (Round-4 pivotal experiment.)

Evidence that it is NOT: tools/roofline_march.py measured a single-jit
1080p march at 0.06 ms (32e9 rays/s — 889% of the synthetic gather speed
of light measured in the same process), and 1-gather vs 12-gather
synthetic loops "ran" at the same wall time (~50 us/call) — i.e.
block_until_ready resolved at dispatch, not completion.

Protocol (the only one that cannot be fooled):
  * one measurement per fresh process (the first device->host readback
    permanently degrades dispatch, so nothing may be timed after it);
  * iterations are data-chained (iteration i+1's input depends on
    iteration i's output);
  * the timed region ends with a readback of one scalar folded from the
    final output — the readback cannot return before every chained
    iteration has truly executed;
  * run at two iteration counts; the SLOPE (t_N2 - t_N1)/(N2 - N1) is the
    true per-iteration time, with readback/constant overhead cancelled.

Modes measured (each at iters and 3*iters):
  jit1   — the whole 1080p march as ONE jitted executable (32 unrolled
           65536-ray tile loops), the roofline configuration;
  hostt  — host-tiled march_frame (32 separate dispatches/frame + eager
           concat), the bench.py configuration.

Usage:  python tools/diag_sync.py            (orchestrator, TPU, run alone)
        python tools/diag_sync.py --mode jit1 --iters 3   (one worker)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_sync: {msg}", file=sys.stderr, flush=True)


def worker(mode: str, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.ops.march_jnp import march_frame, march_tiled
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    tile = 65536
    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
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

    if mode == "jit1":
        @jax.jit
        def frame(w, o, d):
            r = march_tiled(w, o, d, max_steps=512, tile=tile,
                            assume_resident=True)
            return r.t
    elif mode == "hostt":
        def frame(w, o, d):
            return march_frame(w, o, d, max_steps=512, tile=tile,
                               assume_resident=True).t
    else:
        raise SystemExit(f"unknown mode {mode}")

    @jax.jit
    def chain(o, s):
        return o + jnp.zeros((1, 3), jnp.float32) * s

    note(f"[{mode} x{iters}] compiling")
    t0 = time.time()
    t = frame(world, origins, dirs)
    jax.block_until_ready(t)
    jax.block_until_ready(chain(origins, t[0]))
    note(f"[{mode} x{iters}] warm ({time.time()-t0:.1f}s); timing")

    t0 = time.time()
    o = origins
    for _ in range(iters):
        t = frame(world, o, dirs)
        o = chain(origins, t[0])
    jax.block_until_ready(t)
    t_block = time.time() - t0
    sink = float(np.asarray(jnp.sum(t)))  # first readback: the true fence
    t_sync = time.time() - t0

    print("RESULT " + json.dumps({
        "mode": mode, "iters": iters, "n_rays": n_rays,
        "t_block_s": round(t_block, 4), "t_sync_s": round(t_sync, 4),
        "sink": sink,
    }), flush=True)


def spawn(mode, iters):
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--mode", mode,
         "--iters", str(iters)],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stderr.write(p.stderr)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise SystemExit(f"worker {mode} x{iters} failed rc={p.returncode}:\n{p.stdout}")


def main():
    iters = int(os.environ.get("SYNC_ITERS", "2"))
    out = {}
    for mode in ("jit1", "hostt"):
        a = spawn(mode, iters)
        b = spawn(mode, iters * 3)
        slope_s = (b["t_sync_s"] - a["t_sync_s"]) / (b["iters"] - a["iters"])
        out[mode] = {
            "per_frame_true_ms": round(slope_s * 1e3, 2),
            "rays_per_s_true": round(a["n_rays"] / slope_s),
            "block_claimed_ms_lo": round(a["t_block_s"] / a["iters"] * 1e3, 2),
            "block_claimed_ms_hi": round(b["t_block_s"] / b["iters"] * 1e3, 2),
            "sync_total_s": [a["t_sync_s"], b["t_sync_s"]],
            "block_total_s": [a["t_block_s"], b["t_block_s"]],
            "iters": [a["iters"], b["iters"]],
        }
        note(f"{mode}: TRUE {out[mode]['per_frame_true_ms']} ms/frame "
             f"({out[mode]['rays_per_s_true']/1e6:.1f}M rays/s); "
             f"block_until_ready claimed "
             f"{out[mode]['block_claimed_ms_lo']}-"
             f"{out[mode]['block_claimed_ms_hi']} ms")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--mode" in sys.argv:
        worker(sys.argv[sys.argv.index("--mode") + 1],
               int(sys.argv[sys.argv.index("--iters") + 1]))
    else:
        main()
