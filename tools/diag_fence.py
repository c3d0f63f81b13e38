"""Find an honest completion fence on the axon tunnel (round 4).

Established so far (docs/PERF_NOTES.md r4): block_until_ready resolves at
dispatch; debug/io callbacks are UNIMPLEMENTED in axon_pjrt; a readback
issued while work is in flight flips the process into degraded dispatch
and drains the queue ~1000x slow (so readbacks can't fence either).

Candidates probed here, each calibrated against a bf16 matmul chain whose
true duration is known from the MXU roofline (L x 4096^3 matmuls; on a
~197 TFLOPS v5e, 2048 iters = 281 TFLOP ~= 1.5-3 s):

  A. poll jax.Array.is_ready() on the chain's output (passive, no
     transfer).  Honest iff it turns true at ~the roofline time, not at
     dispatch.
  B. sleep-probe: dispatch, block, sleep S, then read back one scalar.
     If execution proceeds asynchronously at full speed, the readback is
     instant for S > true time and pathological for S < true time.
     Modes: --mode sleep --sleep S (one measurement per process).

Usage:
  python tools/diag_fence.py --mode isready          (probe A)
  python tools/diag_fence.py --mode sleep --sleep 5  (probe B, one S)
  python tools/diag_fence.py                         (A, then B at two S)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_fence: {msg}", file=sys.stderr, flush=True)


def setup_chain():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    L = int(os.environ.get("FENCE_ITERS", "2048"))
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


def probe_isready():
    import jax

    heavy, w, x, flops = setup_chain()
    note(f"compiling chain ({flops/1e12:.0f} TFLOP)")
    t0 = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    t_block_cold = time.time() - t0
    note(f"cold block returned at {t_block_cold:.2f}s; polling is_ready on a "
         "fresh dispatch")

    t0 = time.time()
    s = heavy(w, x)
    t_dispatch = time.time() - t0
    t_ready = None
    deadline = time.time() + 600
    while time.time() < deadline:
        if s.is_ready():
            t_ready = time.time() - t0
            break
        time.sleep(0.01)
    out = {
        "mode": "isready",
        "dispatch_s": round(t_dispatch, 4),
        "is_ready_s": None if t_ready is None else round(t_ready, 4),
        "tflop": round(flops / 1e12, 1),
        "implied_tflops": None if not t_ready else round(flops / 1e12 / t_ready, 1),
    }
    note(f"is_ready fired at {t_ready}s -> implied "
         f"{out['implied_tflops']} TFLOPS (v5e peak ~197)")
    print("RESULT " + json.dumps(out), flush=True)


def probe_sleep(sleep_s: float):
    import jax

    heavy, w, x, flops = setup_chain()
    note(f"compiling chain ({flops/1e12:.0f} TFLOP)")
    s = heavy(w, x)
    jax.block_until_ready(s)
    # fresh dispatch; DON'T touch it; sleep; then read back one scalar
    t0 = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    t_block = time.time() - t0
    note(f"dispatched (block {t_block:.3f}s); sleeping {sleep_s}s")
    time.sleep(sleep_s)
    t1 = time.time()
    v = float(np.asarray(s))
    t_read = time.time() - t1
    out = {
        "mode": "sleep", "sleep_s": sleep_s,
        "block_s": round(t_block, 4),
        "readback_s": round(t_read, 4),
        "tflop": round(flops / 1e12, 1),
        "value": v,
    }
    note(f"readback after {sleep_s}s sleep took {t_read:.3f}s")
    print("RESULT " + json.dumps(out), flush=True)


def main():
    results = []
    for args in (["--mode", "isready"],
                 ["--mode", "sleep", "--sleep", "8"],
                 ["--mode", "sleep", "--sleep", "0.3"]):
        note(f"spawning {args}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=1500,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(p.stderr)
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[7:]))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
        if mode == "isready":
            probe_isready()
        else:
            probe_sleep(float(sys.argv[sys.argv.index("--sleep") + 1]))
    else:
        main()
