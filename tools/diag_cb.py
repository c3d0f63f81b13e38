"""Passive completion-fence probe: does jax.debug.callback fire at TRUE
execution time through the axon tunnel, without poisoning dispatch?

Round-4 context (docs/PERF_NOTES.md): block_until_ready through the tunnel
resolves at DISPATCH, not completion; enqueued work runs asynchronously at
full speed if left alone; but a device->host readback issued while work is
in flight flips the process into degraded dispatch AND drains the queue
~1000x slow.  So neither block_until_ready nor trailing readbacks can time
device work.  A debug callback that fires when the computation actually
executes would be a passive, non-poisoning fence — this probe checks:

  1. CALIBRATION: a bf16 matmul chain with a known FLOP count, end
     callback carrying a result-dependent scalar.  The callback must fire
     no earlier than the roofline time of the chain (on a ~200 TFLOPS
     v5e, 2048 iters of 4096^2 @ 4096^2 = 281 TFLOP ~= 1.4 s minimum) and
     the host must observe it AFTER block_until_ready returns early.
  2. POISON CHECK: after the callback fires, a tiny jitted op is timed
     100x with block_until_ready (the r3 dispatch probe).  >1 ms/op means
     the callback degraded the process like a readback would.
  3. If healthy: the 1080p march frame (bench configuration) is timed by
     callback fence, giving the first TRUE march number.

Run alone on the TPU: python tools/diag_cb.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_cb: {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    fired = []

    def cb(tag, _x):
        fired.append((str(tag), time.time()))

    out = {}

    # ---- 1. calibration: known-FLOP matmul chain --------------------------
    L = int(os.environ.get("CB_ITERS", "2048"))
    N = 4096
    flops = 2 * L * N * N * N

    @jax.jit
    def heavy(w, x):
        def body(_i, a):
            return jnp.tanh(a @ w)

        r = jax.lax.fori_loop(0, L, body, x)
        s = jnp.sum(r)
        jax.debug.callback(cb, "heavy_end", s)
        return s

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32),
                    dtype=jnp.bfloat16)

    note(f"compiling calibration chain ({L} x {N}^3 matmuls, "
         f"{flops/1e12:.0f} TFLOP)")
    t_call = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    t_block = time.time() - t_call
    note(f"block_until_ready returned at {t_block:.3f}s (includes compile); "
         "waiting for the end callback")
    deadline = time.time() + 1800
    while not fired and time.time() < deadline:
        time.sleep(0.05)
    if not fired:
        note("CALLBACK NEVER FIRED within 30 min — not usable as a fence")
        out["callback_works"] = False
        print(json.dumps(out, indent=1))
        return
    t_cb = fired[-1][1] - t_call
    out["calib_block_s"] = round(t_block, 3)
    out["calib_cb_s"] = round(t_cb, 3)
    out["calib_tflop"] = round(flops / 1e12, 1)
    out["calib_implied_tflops"] = round(flops / 1e12 / max(t_cb, 1e-9), 1)
    note(f"end callback at {t_cb:.3f}s after call -> implied "
         f"{out['calib_implied_tflops']} TFLOPS (v5e peak ~197 bf16)")

    # Second run, warm (no compile in the span):
    fired.clear()
    t_call = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    t_block2 = time.time() - t_call
    while not fired and time.time() < deadline:
        time.sleep(0.05)
    t_cb2 = fired[-1][1] - t_call
    out["calib_warm_block_s"] = round(t_block2, 4)
    out["calib_warm_cb_s"] = round(t_cb2, 4)
    out["calib_warm_implied_tflops"] = round(flops / 1e12 / max(t_cb2, 1e-9), 1)
    note(f"warm: block={t_block2:.4f}s cb={t_cb2:.4f}s "
         f"({out['calib_warm_implied_tflops']} TFLOPS implied)")

    # ---- 2. poison check --------------------------------------------------
    @jax.jit
    def tiny(a):
        return a * 2 + 1

    a = jnp.arange(1024, dtype=jnp.int32)
    jax.block_until_ready(tiny(a))
    t0 = time.time()
    for _ in range(100):
        r = tiny(a)
    jax.block_until_ready(r)
    per_op_ms = (time.time() - t0) / 100 * 1e3
    out["tiny_dispatch_ms_after_cb"] = round(per_op_ms, 3)
    out["poisoned_by_cb"] = bool(per_op_ms > 1.0)
    note(f"tiny dispatch after callback: {per_op_ms:.3f} ms/op "
         f"({'POISONED' if per_op_ms > 1.0 else 'healthy'})")

    # ---- 3. march frame by callback fence ---------------------------------
    if not out["poisoned_by_cb"]:
        from bench import build_world
        from octree_raymarcher_tpu.ops.march_jnp import march_frame
        from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
        from octree_raymarcher_tpu.shade.tiling import block_permutation

        world = build_world()
        world = jax.tree_util.tree_map(jnp.asarray, world)
        cam = PerspectiveCamera(
            position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
            fov_deg=80.0, width=1920, height=1080,
        )
        o, d = cam.rays()
        perm, _ = block_permutation(cam.height, cam.width, 128)
        o = jnp.asarray(o[perm])
        d = jnp.asarray(d[perm])
        jax.block_until_ready(world.tree)

        @jax.jit
        def fence(t):
            s = jnp.sum(t)
            jax.debug.callback(cb, "march_end", s)
            return s

        note("compiling march frame")
        res = march_frame(world, o, d, max_steps=512, tile=65536,
                          assume_resident=True)
        fired.clear()
        jax.block_until_ready(fence(res.t))
        while not fired and time.time() < deadline:
            time.sleep(0.05)
        note("warm frame complete (callback observed); timing 3 frames")

        times = []
        for _ in range(3):
            fired.clear()
            t_call = time.time()
            res = march_frame(world, o, d, max_steps=512, tile=65536,
                              assume_resident=True)
            fence(res.t)
            t_block = time.time() - t_call
            while not fired and time.time() < deadline:
                time.sleep(0.002)
            times.append(
                {"block_ms": round(t_block * 1e3, 2),
                 "cb_ms": round((fired[-1][1] - t_call) * 1e3, 2)}
            )
            note(f"frame: dispatch(block)={times[-1]['block_ms']}ms "
                 f"TRUE(cb)={times[-1]['cb_ms']}ms")
        out["march_frames"] = times
        n_rays = o.shape[0]
        best = min(t["cb_ms"] for t in times)
        out["march_true_rays_per_s"] = round(n_rays / (best / 1e3))
        note(f"TRUE march: {best}ms/frame = "
             f"{out['march_true_rays_per_s']/1e6:.1f}M rays/s")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
