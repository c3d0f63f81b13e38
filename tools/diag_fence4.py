"""Fence hunt, part 4: WHICH client action forces the journal to flush?

bench.py-style many-dispatch streams demonstrably execute remotely at
full speed (their readbacks are instant), while a lone jit chain sits
unexecuted in the client journal until a readback forces the ~1000x
materialization path (diag_fence.py: 257 s for a ~2 s chain).  Part 3
showed 256 tiny jit dispatches are NOT the trigger.  Plugin strings
suggest other candidates ("flush destroys", BufferDestroy batching, h2d
transfers, "send_unsent: conn None" rebinding).  Each worker dispatches
the known ~2 s matmul chain, applies ONE candidate kick, sleeps 8 s, and
reads back; an instant readback identifies the flush trigger.

Kicks:
  destroy — allocate 64 x 8 MB device buffers via device_put, del them,
            gc (BufferDestroy batch)
  h2d     — 64 x 8 MB fresh jax.device_put transfers, kept alive
  eagerops— 64 eager jnp ops each producing a fresh 8 MB output
  mixed   — the bench.py cocktail: 32 jit calls on 2 MB inputs, eager
            concatenate of their outputs, old outputs dropped each round
  none    — control (expected: slow readback)

Usage: python tools/diag_fence4.py [--kick NAME --sleep S]
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# diag_fence4: {msg}", file=sys.stderr, flush=True)


def worker(kick_name: str, sleep_s: float):
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    L = int(os.environ.get("FENCE_ITERS", "2048"))
    N = 4096

    @jax.jit
    def heavy(w, x):
        def body(_i, a):
            return jnp.tanh(a @ w)

        r = jax.lax.fori_loop(0, L, body, x)
        return jnp.sum(r)

    @jax.jit
    def tile_op(a):
        return a * 2 + 1

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32),
                    dtype=jnp.bfloat16)
    big_host = rng.standard_normal((1024, 2048)).astype(np.float32)  # 8 MB
    tiles = [jnp.asarray(rng.standard_normal((512, 1024)).astype(np.float32))
             for _ in range(4)]  # 2 MB each

    t0 = time.time()
    s = heavy(w, x)
    jax.block_until_ready(s)
    jax.block_until_ready(tile_op(tiles[0]))
    note(f"compiled ({time.time()-t0:.1f}s); fresh chain + kick={kick_name}")

    t0 = time.time()
    s = heavy(w, x)
    t_disp = time.time() - t0

    if kick_name == "destroy":
        bufs = [jax.device_put(big_host) for _ in range(64)]
        del bufs
        gc.collect()
    elif kick_name == "h2d":
        keep = [jax.device_put(big_host) for _ in range(64)]
        jax.block_until_ready(keep[-1])
    elif kick_name == "eagerops":
        acc = []
        for i in range(64):
            acc.append(tiles[i % 4] * (i + 1.0))
        out = jnp.concatenate(acc)
    elif kick_name == "mixed":
        outs = None
        for _ in range(8):
            prev = outs
            outs = jnp.concatenate([tile_op(t) for t in tiles])
            del prev
            gc.collect()
    elif kick_name == "none":
        pass
    else:
        raise SystemExit(f"unknown kick {kick_name}")
    t_kick = time.time() - t0
    note(f"chain dispatch {t_disp*1e3:.1f}ms; kick applied at {t_kick:.2f}s; "
         f"sleeping {sleep_s}s")
    time.sleep(sleep_s)
    t1 = time.time()
    v = float(np.asarray(s))
    t_read = time.time() - t1
    note(f"readback took {t_read:.3f}s")
    print("RESULT " + json.dumps({
        "kick": kick_name, "sleep_s": sleep_s,
        "chain_dispatch_s": round(t_disp, 4),
        "kick_done_s": round(t_kick, 4),
        "readback_s": round(t_read, 3), "value": v,
    }), flush=True)


def main():
    results = []
    for k in ("mixed", "destroy", "h2d", "eagerops"):
        note(f"spawn kick={k}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--kick", k,
             "--sleep", "8"],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(p.stderr)
        got = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[7:])
        results.append(got or {"kick": k, "error": p.returncode})
        # Stop early once we find a working trigger.
        if got and got.get("readback_s", 1e9) < 1.0:
            note(f"TRIGGER FOUND: {k}")
            break
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--kick" in sys.argv:
        worker(sys.argv[sys.argv.index("--kick") + 1],
               float(sys.argv[sys.argv.index("--sleep") + 1]))
    else:
        main()
