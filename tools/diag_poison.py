"""Part 4: bisect WHICH op inside the train step permanently poisons
subsequent dispatch through the axon tunnel (diag_segments3: one step
execution turns a 1.6 ms 4-tile probe into 16.6 s, process-wide).

Poison is permanent per process, so run ONE candidate per process:

    python tools/diag_poison.py <candidate>

Candidates:
  fwd        composite forward only (big [N,K] gathers from the ~7.7M-slot
             param table; exact size = num_param_slots(world), derived
             below, never hardcoded)
  grad       value_and_grad(composite) — adds the scatter-add VJP
  adam       optax.adam update alone on the full-size params (zero grads)
  step       grad + adam (the known-poison full step)
  stepsmall  full step but on 100k-slot params (size dependence)
  scatter    bare 1M-element scatter-add into a param-table-sized f32 table
  gather     bare 1M-element (flat) gather from the same table
  gather2d   the same gather with 2-D [tile, K] indices
  cumsum     jnp.cumsum over [tile, K] (composite's transmittance prefix)
  where      boolean jnp.where over [tile, K]
  closure    jit with a closed-over device array (constant-capture path)

Workaround candidates (added after `step` reproduced the poison and the
elementary ops proved clean):
  stepdonate    the full step with params+opt_state DONATED
  gradthenadam  grad in one jit, adam update in a second jit (split)
  stepsgd       grad + plain SGD apply in one jit (no optimizer moments)

Narrowing candidates (added after `fwd` ALONE reproduced the poison,
1.26 ms -> 16.6 s probes; grad/step are supersets):
  fwdsigma   density half only: [N,K] gather from f32[P] + softplus +
             cumsum + sum
  fwdalbedo  albedo half only: 3 column gathers ar[:,0][idx] from
             f32[P,3] + sigmoid + weighted sum
  fwdcolumn  bare 1M gather from ONE strided column of f32[P,3]
  fwdnoexp   composite shape without transcendentals (linear ops only)

Prints probe-before / probe-after; a poisoned process shows seconds.
Scene constants (camera, tile=65536, K=16) mirror bench_diff.py's default
workload; this is a frozen one-shot bisect harness for that workload.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def note(msg):
    print(f"# poison[{sys.argv[1]}]: {msg}", file=sys.stderr, flush=True)


def main():
    which = sys.argv[1]
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.diff import composite, init_params_from_world
    from octree_raymarcher_tpu.diff.segments import (
        _sample_segments_jit,
        num_param_slots,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    K, tile = 16, 65536
    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)
    P_full = num_param_slots(world)  # full param-table size (was hardcoded)
    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    o = jnp.asarray(origins[perm])
    d = jnp.asarray(dirs[perm])

    def probe(label):
        idx = [0, 8, 16, 24]
        outs = [
            _sample_segments_jit(world, o[i * tile:(i + 1) * tile],
                                 d[i * tile:(i + 1) * tile], K, 512, 8)
            for i in idx
        ]
        jax.block_until_ready(outs[-1].slot)
        t0 = time.time()
        for _ in range(2):
            outs = [
                _sample_segments_jit(world, o[i * tile:(i + 1) * tile],
                                     d[i * tile:(i + 1) * tile], K, 512, 8)
                for i in idx
            ]
        jax.block_until_ready(outs[-1].slot)
        dt = (time.time() - t0) / 2
        print(f"probe {label}: {dt*1e3:.2f} ms / 4 tiles", flush=True)

    probe("before")

    segs = _sample_segments_jit(world, o[:tile], d[:tile], K, 512, 8)
    jax.block_until_ready(segs.slot)

    if which == "stepsmall":
        P = 100_000
        params = init_params_from_world(world).__class__(
            density_raw=jnp.zeros(P, jnp.float32),
            albedo_raw=jnp.zeros((P, 3), jnp.float32),
        )
        # remap slots into range
        segs = segs.replace(slot=jnp.where(segs.slot >= 0, segs.slot % P, -1))
    else:
        params = init_params_from_world(world)
    jax.block_until_ready(params.density_raw)
    target = jnp.zeros((tile, 3), dtype=jnp.float32)
    opt = optax.adam(1e-2)

    def loss_fn(p, sg):
        return jnp.mean((composite(sg, p)["rgb"] - target) ** 2)

    if which == "fwd":
        f = jax.jit(loss_fn)
        jax.block_until_ready(f(params, segs))
    elif which == "grad":
        f = jax.jit(jax.value_and_grad(loss_fn))
        _, g = f(params, segs)
        jax.block_until_ready(g.density_raw)
    elif which == "adam":
        st = opt.init(params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

        @jax.jit
        def f(p, s, g):
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s

        p2, s2 = f(params, st, zeros)
        jax.block_until_ready(p2.density_raw)
    elif which in ("step", "stepsmall"):
        st = opt.init(params)

        @jax.jit
        def f(p, s, sg):
            loss, g = jax.value_and_grad(loss_fn)(p, sg)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, loss

        p2, s2, loss = f(params, st, segs)
        jax.block_until_ready(loss)
    elif which == "stepdonate":
        st = opt.init(params)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def f(p, s, sg):
            loss, g = jax.value_and_grad(loss_fn)(p, sg)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, loss

        p2, s2, loss = f(params, st, segs)
        jax.block_until_ready(loss)
    elif which == "gradthenadam":
        st = opt.init(params)
        fg = jax.jit(jax.value_and_grad(loss_fn))

        @jax.jit
        def fa(p, s, g):
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s

        loss, g = fg(params, segs)
        p2, s2 = fa(params, st, g)
        jax.block_until_ready(p2.density_raw)
    elif which == "stepsgd":
        @jax.jit
        def f(p, sg):
            loss, g = jax.value_and_grad(loss_fn)(p, sg)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, g)
            return p, loss

        p2, loss = f(params, segs)
        jax.block_until_ready(loss)
    elif which == "scatter":
        tbl = jnp.zeros(P_full, jnp.float32)
        idx = jnp.clip(segs.slot.reshape(-1), 0, tbl.shape[0] - 1)
        vals = jnp.ones_like(idx, jnp.float32)

        @jax.jit
        def f(t, i, v):
            return t.at[i].add(v)

        jax.block_until_ready(f(tbl, idx, vals))
    elif which == "gather":
        tbl = jnp.zeros(P_full, jnp.float32)
        idx = jnp.clip(segs.slot.reshape(-1), 0, tbl.shape[0] - 1)

        @jax.jit
        def f(t, i):
            return t[i].sum()

        jax.block_until_ready(f(tbl, idx))

    elif which == "gather2d":
        tbl = jnp.zeros(P_full, jnp.float32)
        idx2 = jnp.clip(segs.slot, 0, tbl.shape[0] - 1)  # [tile, K] 2-D indices

        @jax.jit
        def f(t, i):
            return t[i].sum()

        jax.block_until_ready(f(tbl, idx2))
    elif which == "cumsum":
        x = jnp.abs(segs.t1 - segs.t0)

        @jax.jit
        def f(v):
            return jnp.cumsum(v, axis=1).sum()

        jax.block_until_ready(f(x))
    elif which == "fwdsigma":
        dr = params.density_raw
        dl = jnp.maximum(segs.t1 - segs.t0, 0.0)
        valid = (segs.slot >= 0).astype(jnp.float32)
        idx2 = jnp.clip(segs.slot, 0, dr.shape[0] - 1)

        @jax.jit
        def f(table, i, w_, v):
            sigma = jnp.logaddexp(table[i], 0.0)
            tau = sigma * w_ * v
            T = jnp.exp(-(jnp.cumsum(tau, axis=1) - tau))
            return ((1.0 - jnp.exp(-tau)) * T).sum()

        jax.block_until_ready(f(dr, idx2, dl, valid))
    elif which == "fwdalbedo":
        ar = params.albedo_raw
        idx2 = jnp.clip(segs.slot, 0, ar.shape[0] - 1)
        wgt = jnp.abs(segs.t1 - segs.t0)

        @jax.jit
        def f(table, i, w_):
            alb = jax.nn.sigmoid(jnp.stack(
                [table[:, 0][i], table[:, 1][i], table[:, 2][i]], axis=-1))
            return (w_[..., None] * alb).sum()

        jax.block_until_ready(f(ar, idx2, wgt))
    elif which == "fwdcolumn":
        ar = params.albedo_raw
        idx = jnp.clip(segs.slot.reshape(-1), 0, ar.shape[0] - 1)

        @jax.jit
        def f(table, i):
            return table[:, 0][i].sum()

        jax.block_until_ready(f(ar, idx))
    elif which == "fwdnoexp":
        dr = params.density_raw
        dl = jnp.maximum(segs.t1 - segs.t0, 0.0)
        idx2 = jnp.clip(segs.slot, 0, dr.shape[0] - 1)

        @jax.jit
        def f(table, i, w_):
            tau = table[i] * w_
            pre = jnp.cumsum(tau, axis=1) - tau
            return (tau * pre).sum()

        jax.block_until_ready(f(dr, idx2, dl))
    elif which == "closure":
        big = jnp.zeros((tile, 3), jnp.float32)  # closed-over device array

        @jax.jit
        def f(x):
            return ((x + big) ** 2).mean()

        jax.block_until_ready(f(jnp.ones((tile, 3), jnp.float32)))
    elif which == "where":
        valid = segs.slot >= 0

        @jax.jit
        def f(v, a):
            return jnp.where(v, a, 0.0).sum()

        jax.block_until_ready(f(valid, segs.t0))
    else:
        raise SystemExit(f"unknown candidate {which}")

    note("candidate executed")
    probe("after")


if __name__ == "__main__":
    main()
