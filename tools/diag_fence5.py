"""Fence hunt, part 5: barrier-flavored candidates.

Plugin strings mention journal "barriers" with flush semantics ("compact
with stashed barriers", "barrier reset before flush", "barrier
evict-flush failed").  Candidates:

  barrier — jax.effects_barrier() after dispatching the known ~2 s chain
  compact — AXON_JOURNAL_COMPACT=1 in the worker's environment
  sync    — jax.device(s)[0].synchronize_all_activity() if exposed

Each worker: dispatch chain, apply candidate, sleep 8 s, read back.
Instant readback = fence found.  Usage: python tools/diag_fence5.py
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
    print(f"# diag_fence5: {msg}", file=sys.stderr, flush=True)


def worker(cand: str, sleep_s: float):
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

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32) * 0.01,
                    dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32),
                    dtype=jnp.bfloat16)

    s = heavy(w, x)
    jax.block_until_ready(s)
    note(f"compiled; fresh chain + candidate={cand}")

    t0 = time.time()
    s = heavy(w, x)
    applied = None
    if cand == "barrier":
        jax.effects_barrier()
        applied = "effects_barrier"
    elif cand == "newcompile":
        # A genuinely novel executable (random reshape/odd shapes so no
        # cache hit): if compile requests force the journal through
        # ("journal: injecting LoadExecutable before Execute"), this is
        # the flush bench.py was getting implicitly from its per-mode
        # compiles.
        salt = int.from_bytes(os.urandom(2), "little") % 977 + 31

        @jax.jit
        def novel(a):
            return jnp.cumsum(a.reshape(salt, -1), axis=1)[::7, ::3].sum()

        z = jnp.arange(salt * 12, dtype=jnp.float32)
        jax.block_until_ready(novel(z))
        applied = f"novel compile salt={salt}"
    elif cand == "sync":
        d = jax.devices()[0]
        for name in ("synchronize_all_activity", "synchronize"):
            if hasattr(d, name):
                try:
                    getattr(d, name)()
                    applied = name
                    break
                except Exception as ex:  # noqa: BLE001
                    applied = f"{name} failed: {ex!r}"
    elif cand == "compact":
        applied = f"env AXON_JOURNAL_COMPACT={os.environ.get('AXON_JOURNAL_COMPACT')}"
    t_kick = time.time() - t0
    note(f"candidate applied ({applied}) at {t_kick:.3f}s; sleeping {sleep_s}s")
    time.sleep(sleep_s)
    t1 = time.time()
    v = float(np.asarray(s))
    t_read = time.time() - t1
    note(f"readback took {t_read:.3f}s")
    print("RESULT " + json.dumps({
        "candidate": cand, "applied": applied, "sleep_s": sleep_s,
        "kick_done_s": round(t_kick, 4), "readback_s": round(t_read, 3),
        "value": v,
    }), flush=True)


def main():
    results = []
    for cand in ("newcompile", "barrier", "sync", "compact"):
        note(f"spawn {cand}")
        env = dict(os.environ)
        if cand == "compact":
            env["AXON_JOURNAL_COMPACT"] = "1"
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cand", cand,
             "--sleep", "8"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        sys.stderr.write(p.stderr)
        got = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[7:])
        results.append(got or {"candidate": cand, "error": p.returncode})
        if got and got.get("readback_s", 1e9) < 1.0:
            note(f"FENCE FOUND: {cand}")
            break
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--cand" in sys.argv:
        worker(sys.argv[sys.argv.index("--cand") + 1],
               float(sys.argv[sys.argv.index("--sleep") + 1]))
    else:
        main()
