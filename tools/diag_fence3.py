"""Fence hunt, part 3: the flush-kick hypothesis.

Plugin forensics (strings in /opt/axon/libaxon_pjrt.so): the axon tunnel is
a journaling/replay client ("axon-remote-loop", "journal: ... replaying",
"cassette: pending past cap", speculator kv).  Working model:

  * dispatch appends to a client-side journal (block_until_ready = append
    ack — the lie);
  * the journal auto-flushes to the remote TPU loop when it grows past a
    cap, and flushed work executes remotely at full speed (bench.py's
    hundreds of dispatches kept flushing, so its readbacks were instant);
  * a readback with UNflushed work forces a slow materialization path
    (~100-1000x: the 257 s drain of a ~2 s matmul chain, diag_fence.py).

If true, a practical honest fence exists: after the timed chain, dispatch
M tiny independent ops (the KICK) to roll the journal past its cap, sleep
S, then read back one scalar.  Readback < 1 s proves the chain truly
executed within (dispatch + S) — an upper bound that tightens by lowering
S across subprocess runs.

Worker modes (one process each):
  --mode kick --n-kick M --sleep S   heavy chain + M kicks + sleep + readback

Orchestrator tries (M=256, S=8) first; if the readback is instant, it
re-runs at S=4,2,1 to bracket the chain's true time.
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
    print(f"# diag_fence3: {msg}", file=sys.stderr, flush=True)


def worker(n_kick: int, sleep_s: float):
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

    @jax.jit
    def kick(a):
        return a + 1

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32),
                    dtype=jnp.bfloat16)
    a = jnp.arange(256, dtype=jnp.int32)

    t0 = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    jax.block_until_ready(kick(a))
    t_compile = time.time() - t0
    note(f"compiled ({t_compile:.1f}s); dispatching fresh chain + "
         f"{n_kick} kicks")

    t0 = time.time()
    s = heavy(w, x)
    t_disp = time.time() - t0
    for _ in range(n_kick):
        a = kick(a)
    t_kick = time.time() - t0
    jax.block_until_ready(a)
    t_block = time.time() - t0
    note(f"chain dispatch {t_disp*1e3:.1f}ms; kicks done at {t_kick:.2f}s "
         f"(block {t_block:.2f}s); sleeping {sleep_s}s")
    time.sleep(sleep_s)
    t1 = time.time()
    v = float(np.asarray(s))
    t_read = time.time() - t1
    note(f"readback took {t_read:.3f}s")
    print("RESULT " + json.dumps({
        "n_kick": n_kick, "sleep_s": sleep_s,
        "chain_dispatch_s": round(t_disp, 4),
        "kick_total_s": round(t_kick, 4),
        "block_s": round(t_block, 4),
        "readback_s": round(t_read, 3),
        "tflop": round(flops / 1e12, 1),
        "value": v,
    }), flush=True)


def spawn(n_kick, sleep_s, timeout=1800):
    note(f"spawn kick={n_kick} sleep={sleep_s}")
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--mode", "kick",
         "--n-kick", str(n_kick), "--sleep", str(sleep_s)],
        capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stderr.write(p.stderr)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    return {"error": p.returncode}


def main():
    results = [spawn(256, 8.0)]
    if results[0].get("readback_s", 1e9) < 1.0:
        for s in (4.0, 2.0, 1.0):
            results.append(spawn(256, s))
            if results[-1].get("readback_s", 1e9) >= 1.0:
                break
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--mode" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--n-kick") + 1]),
               float(sys.argv[sys.argv.index("--sleep") + 1]))
    else:
        main()
