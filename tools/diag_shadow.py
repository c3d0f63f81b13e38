"""Round-3 bisect: why do SHADOW rays march ~100-300x slower than camera
rays through the SAME tile executable, and why does executing them degrade
subsequent dispatch (bench_frame_modes.json: 135k rays/s vs 61.7M plain)?

Methodology (axon rules, docs/PERF_NOTES.md): no device->host readback
until all timed phases are done; block_until_ready only.  One fresh
process.  Run:  timeout 1800 python tools/diag_shadow.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_world
    from octree_raymarcher_tpu.core.constants import EPS
    from octree_raymarcher_tpu.core.geometry import cube_normal
    from octree_raymarcher_tpu.ops.march_jnp import march
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.lights import LightRig
    from octree_raymarcher_tpu.shade.tiling import block_permutation

    timings = {}

    probe_f = jax.jit(lambda a: a * 2.0 + 1.0)
    probe_x = jnp.arange(1024, dtype=jnp.float32)

    def probe(tag, reps=20):
        jax.block_until_ready(probe_f(probe_x))
        t0 = time.time()
        for _ in range(reps):
            y = probe_f(probe_x)
        jax.block_until_ready(y)
        timings[f"probe_{tag}_ms"] = round((time.time() - t0) / reps * 1e3, 3)

    world = build_world()
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    perm, _ = block_permutation(cam.height, cam.width, 128)
    origins, dirs = origins[perm], dirs[perm]
    TILE = 65536
    o = jnp.asarray(origins[:TILE])
    d = jnp.asarray(dirs[:TILE])

    march_jit = jax.jit(
        lambda w, oo, dd: march(w, oo, dd, 512, assume_resident=True,
                                _check_const_pools=False)
    )
    march_live_jit = jax.jit(
        lambda w, oo, dd, lv, ms: march(
            w, oo, dd, ms, live_start=lv, assume_resident=True,
            _check_const_pools=False),
        static_argnames=("ms",),
    )
    steps_jit = jax.jit(
        lambda w, oo, dd, lv: march(
            w, oo, dd, 512, live_start=lv, steps_aov="coarse",
            assume_resident=True, _check_const_pools=False),
    )

    # ---- phase A: camera tile ------------------------------------------
    res = jax.block_until_ready(march_jit(world, o, d))
    t0 = time.time()
    for _ in range(5):
        res = march_jit(world, o, d)
    jax.block_until_ready(res)
    timings["camera_march_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
    probe("after_camera")

    # ---- phase B: shadow rays from the camera hits ----------------------
    lights = LightRig.default()

    @jax.jit
    def shadow_rays(oo, dd, t, hit, bmin, size, ld):
        ldir = -ld
        ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-12)
        t_hit = jnp.where(hit, t, jnp.float32(0.0))
        p = oo + dd * (t_hit - jnp.float32(EPS))[:, None]
        n = cube_normal(p, bmin, bmin + size[:, None])
        start = p + n * jnp.float32(4 * EPS)
        return start, jnp.broadcast_to(ldir, start.shape), hit.astype(jnp.int32)

    ld = jnp.asarray(lights.directional.direction, jnp.float32)
    start, sdir, live = jax.block_until_ready(
        shadow_rays(o, d, res.t, res.hit, res.cell_bmin, res.cell_size, ld))

    sres = jax.block_until_ready(march_live_jit(world, start, sdir, live, 512))
    t0 = time.time()
    for _ in range(5):
        sres = march_live_jit(world, start, sdir, live, 512)
    jax.block_until_ready(sres)
    timings["shadow_march_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
    probe("after_shadow")

    # ---- phase C: camera tile again (poison check on the SAME exe) ------
    t0 = time.time()
    for _ in range(5):
        res2 = march_jit(world, o, d)
    jax.block_until_ready(res2)
    timings["camera_march_after_shadow_ms"] = round((time.time() - t0) / 5 * 1e3, 2)

    # ---- phase D: capped shadow march (max_steps=64) ---------------------
    sres64 = jax.block_until_ready(march_live_jit(world, start, sdir, live, 64))
    t0 = time.time()
    for _ in range(5):
        sres64 = march_live_jit(world, start, sdir, live, 64)
    jax.block_until_ready(sres64)
    timings["shadow_march_cap64_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
    probe("after_cap64")

    # ---- phase E: coarse step counts (camera + shadow) -------------------
    ones = jnp.ones(TILE, dtype=jnp.int32)
    cam_steps = jax.block_until_ready(steps_jit(world, o, d, ones)).steps
    sh_steps = jax.block_until_ready(steps_jit(world, start, sdir, live)).steps
    probe("after_steps")

    # ---- readbacks allowed from here on ----------------------------------
    cam_steps = np.asarray(cam_steps)
    sh_steps = np.asarray(sh_steps)
    live_np = np.asarray(live)
    start_np = np.asarray(start)
    out = {
        "timings": timings,
        "camera_steps": {
            "mean": float(cam_steps.mean()), "max": int(cam_steps.max()),
            "p99": float(np.percentile(cam_steps, 99)),
            "at_cap_frac": float((cam_steps >= 512).mean()),
        },
        "shadow_steps": {
            "mean": float(sh_steps.mean()), "max": int(sh_steps.max()),
            "p99": float(np.percentile(sh_steps, 99)),
            "at_cap_frac": float((sh_steps >= 512).mean()),
        },
        "shadow_live_frac": float(live_np.mean()),
        "shadow_start_nan_frac": float(np.isnan(start_np).any(-1).mean()),
        "shadow_hit_frac_512": float(np.asarray(sres.hit)[live_np > 0].mean()),
        "shadow_hit_frac_64": float(np.asarray(sres64.hit)[live_np > 0].mean()),
        "shadow_hit_agree": float(
            (np.asarray(sres.hit) == np.asarray(sres64.hit)).mean()),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
