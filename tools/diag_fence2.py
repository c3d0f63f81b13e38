"""Fence hunt, part 2 (decisive experiments).  See diag_fence.py for part 1.

Part-1 results (2026-08-20): is_ready() resolves at dispatch (lies);
sleep(8s)-then-readback of a ~2s-roofline matmul chain took 257s — so
enqueued jit work neither completes asynchronously at full speed nor
drains at device speed when read back (~125 ms/iteration ~= per-op host
round-trips of the 33 MB loop carry).  Yet r3 bench.py's bulk readbacks
after its timed loops were fast, so ITS work had completed.  What
distinguishes the paths?  Three experiments:

  E1 lazy-vs-slow:  dispatch the chain, sleep 300 s, read back.
     Instant readback  -> work does execute alone, just slower than 8 s.
     ~257 s readback   -> execution is lazy-until-observed.
  E2 eager-op fence: dispatch the chain (jit), then apply an EAGER
     jnp.sum to its output and time THAT dispatch + block.  r3 bench.py
     always blocked on an eager concatenate over jit outputs and got
     plausible times; if eager dispatch waits for operand readiness, it
     is a true fence (and bench.py's old numbers were honest).
     Then sleep 2 s and read back: instant confirms completion.
  E3 profiler:       jax.profiler.start_trace around the chain; if the
     axon backend exports device streams, their timestamps are ground
     truth regardless of fences.

Usage: python tools/diag_fence2.py [--mode e1|e2|e3]  (no flag: e2, e3 in
subprocesses; e1 only with FENCE_E1=1 — it costs ~5-10 min of chip time).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_fence2: {msg}", file=sys.stderr, flush=True)


def setup_chain(L=None):
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    L = L or int(os.environ.get("FENCE_ITERS", "2048"))
    N = 4096
    flops = 2 * L * N * N * N

    @jax.jit
    def heavy(w, x):
        def body(_i, a):
            return jnp.tanh(a @ w)

        r = jax.lax.fori_loop(0, L, body, x)
        return jnp.sum(r)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32),
                    dtype=jnp.bfloat16)
    return heavy, w, x, flops


def e1():
    import jax

    heavy, w, x, flops = setup_chain()
    s = heavy(w, x)
    jax.block_until_ready(s)  # compile fence only
    t0 = time.time()
    s = heavy(w, x)
    note("dispatched; sleeping 300s (E1: does it run on its own?)")
    time.sleep(300)
    t1 = time.time()
    v = float(np.asarray(s))
    print("RESULT " + json.dumps({
        "mode": "e1", "sleep_s": 300,
        "readback_s": round(time.time() - t1, 3), "value": v,
    }), flush=True)


def e2():
    import jax
    import jax.numpy as jnp

    heavy, w, x, flops = setup_chain()
    t0 = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    note(f"compile+dispatch fence {time.time()-t0:.2f}s; timing eager-sum "
         "fence on a fresh dispatch")
    t0 = time.time()
    s = heavy(w, x)
    t_disp = time.time() - t0
    e = jnp.sum(s)            # EAGER op consuming the jit output
    t_eager_disp = time.time() - t0
    jax.block_until_ready(e)
    t_eager_block = time.time() - t0
    note(f"dispatch={t_disp*1e3:.1f}ms eager-sum dispatch at "
         f"{t_eager_disp:.3f}s, its block at {t_eager_block:.3f}s "
         f"(roofline ~1.4-3s)")
    time.sleep(2.0)
    t1 = time.time()
    v = float(np.asarray(e))
    t_read = time.time() - t1
    print("RESULT " + json.dumps({
        "mode": "e2", "jit_dispatch_s": round(t_disp, 4),
        "eager_dispatch_s": round(t_eager_disp, 4),
        "eager_block_s": round(t_eager_block, 4),
        "readback_after_2s_sleep_s": round(t_read, 3),
        "tflop": round(flops / 1e12, 1),
        "implied_tflops_if_eager_block_true":
            round(flops / 1e12 / max(t_eager_block, 1e-9), 1),
        "value": v,
    }), flush=True)


def e3():
    import jax

    heavy, w, x, flops = setup_chain(L=256)
    s = heavy(w, x)
    jax.block_until_ready(s)
    tdir = "/tmp/axon_trace"
    os.makedirs(tdir, exist_ok=True)
    ok, err = True, None
    try:
        jax.profiler.start_trace(tdir)
        s = heavy(w, x)
        jax.block_until_ready(s)
        time.sleep(1.0)
        jax.profiler.stop_trace()
    except Exception as ex:  # noqa: BLE001
        ok, err = False, repr(ex)
    files = glob.glob(tdir + "/**/*", recursive=True)
    sizes = {os.path.relpath(f, tdir): os.path.getsize(f)
             for f in files if os.path.isfile(f)}
    print("RESULT " + json.dumps({
        "mode": "e3", "trace_ok": ok, "error": err, "files": sizes,
    }), flush=True)


def main():
    modes = ["e2", "e3"] + (["e1"] if os.environ.get("FENCE_E1") == "1" else [])
    results = []
    for m in modes:
        note(f"spawning {m}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", m],
            capture_output=True, text=True, timeout=2400,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(p.stderr)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[7:]))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--mode" in sys.argv:
        {"e1": e1, "e2": e2, "e3": e3}[sys.argv[sys.argv.index("--mode") + 1]]()
    else:
        main()
