"""Inverse-rendering convergence artifact at image scale (VERDICT r3 #6).

BASELINE config 3: optimize per-voxel density+albedo from 8 target views.
This benchmark runs it at 256x256 x 8 views on a real multi-chunk terrain
scene (the golden-test world scaled up one depth), records the loss/PSNR
trajectory as JSON (bench_fit_result.json) and the final rendered view
next to its target as PNGs (bench_fit_view0.png / bench_fit_target0.png).

Protocol:
  * targets are soft-rendered under ground-truth params (the standard
    inverse-rendering setup: recovery is well-posed, so PSNR measures the
    optimization path, not the soft-vs-hard model gap);
  * the starting params perturb BOTH density and albedo of the ground
    truth (albedo fully re-randomized, density offset so solids start
    half-transparent);
  * NO device->host readback happens inside the optimization loop (the
    axon readback curse would degrade every later step ~1000x;
    diff/optim.fit collects device scalars and converts after the loop);
  * timing is wall-clock over the whole fit INCLUDING the final readback
    of the loss history — an honest upper bound (block_until_ready is not
    an execution fence through the axon tunnel; docs/PERF_NOTES.md r4).

Round-5 hardening (VERDICT r4 #8): the artifact records platform/device/
jax version, and two env knobs raise the bar beyond the well-posed warm
start:
  * FIT_INIT=scratch — random start carrying NO ground-truth information
    (uniform low density + noise, random albedo) instead of the default
    GT perturbation (FIT_INIT=perturb);
  * FIT_TARGETS=hard — targets rendered by the HARD renderer (first-hit
    march -> material diffuse color, sky on miss: the binary limit of the
    soft model), so the fit must close the soft-vs-hard model gap too.
FIT_OUT names the output JSON (default bench_fit_result.json), so the
scratch/hard run commits as a second record next to the standard one.

Run alone on the TPU:  python bench_fit.py
Env: FIT_STEPS (default 200), FIT_RES (default 256), FIT_VIEWS (8),
FIT_SEED (0), FIT_PLATFORM=cpu for a small smoke run (FIT_RES<=64 advised).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def note(msg):
    print(f"# bench_fit: {msg}", file=sys.stderr, flush=True)


def main():
    if os.environ.get("FIT_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from octree_raymarcher_tpu.diff import (
        fit,
        init_params_from_world,
        render_soft,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.utils.png import save_png
    from octree_raymarcher_tpu.world.world import World

    steps = int(os.environ.get("FIT_STEPS", "200"))
    res = int(os.environ.get("FIT_RES", "256"))
    n_views = int(os.environ.get("FIT_VIEWS", "8"))
    seed = int(os.environ.get("FIT_SEED", "0"))
    init_mode = os.environ.get("FIT_INIT", "perturb")
    target_mode = os.environ.get("FIT_TARGETS", "soft")
    out_name = os.environ.get("FIT_OUT", "bench_fit_result.json")
    K = 32

    t_all = time.time()
    note("building world")
    w = World.generate(dims=(2, 1, 2), chunksize=32.0, depth=6, seed=7,
                      water_level=4.0, amplitude=16.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    jax.block_until_ready(dev.tree)
    note(f"world on device ({time.time()-t_all:.1f}s)")

    # 8 cameras orbiting the world center, looking inward & slightly down.
    cx, cy_, cz = 32.0, 10.0, 32.0
    radius = 55.0
    cams = []
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        px, pz = cx + radius * np.sin(th), cz + radius * np.cos(th)
        py = 38.0
        yaw = np.degrees(np.arctan2(cx - px, cz - pz))
        horiz = np.hypot(cx - px, cz - pz)
        pitch = np.degrees(np.arctan2(cy_ - py, horiz))
        cams.append(PerspectiveCamera(
            position=(px, py, pz), yaw_deg=float(yaw), pitch_deg=float(pitch),
            fov_deg=60.0, width=res, height=res,
        ))

    # Ground truth + targets: soft render under GT params (default), or
    # the HARD renderer's binary limit (first-hit material diffuse + sky)
    # so the fit must also close the soft-vs-hard model gap.
    gt = init_params_from_world(dev, solid_density=40.0)
    views = []
    note(f"rendering {n_views} {target_mode} target views at {res}x{res}")
    sky = jnp.asarray((0.45, 0.65, 0.95), dtype=jnp.float32)
    if target_mode == "hard":
        from octree_raymarcher_tpu.ops.march_jnp import march_frame
        from octree_raymarcher_tpu.shade.materials import MaterialTable

        diffuse = jnp.asarray(MaterialTable.default().diffuse,
                              dtype=jnp.float32)

        @jax.jit
        def hard_target(w_, o_, d_):
            r = march_frame(w_, o_, d_, max_steps=512)
            mi = jnp.clip(r.material, 0, diffuse.shape[0] - 1)
            col = jnp.stack([diffuse[:, 0][mi], diffuse[:, 1][mi],
                             diffuse[:, 2][mi]], axis=-1)
            return jnp.where(r.hit[:, None], col, sky)
    for cam in cams:
        o, d = cam.rays()
        o, d = jnp.asarray(o), jnp.asarray(d)
        if target_mode == "hard":
            target = hard_target(dev, o, d)
        else:
            target = render_soft(dev, gt, o, d, max_segments=K)["rgb"]
        views.append((o, d, jax.lax.stop_gradient(target)))
    jax.block_until_ready(views[-1][2])

    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    if init_mode == "scratch":
        # From-scratch start: NO ground-truth information — uniform low
        # density (everything nearly transparent) + noise, random albedo.
        start = gt.replace(
            albedo_raw=1.5 * jax.random.normal(k0, gt.albedo_raw.shape),
            density_raw=jnp.float32(-3.0)
            + 0.1 * jax.random.normal(k1, gt.density_raw.shape),
        )
    else:
        # Perturbed start: albedo re-randomized, solids half-ghosted.
        start = gt.replace(
            albedo_raw=1.5 * jax.random.normal(k0, gt.albedo_raw.shape),
            density_raw=gt.density_raw - 3.0
            + 0.1 * jax.random.normal(k1, gt.density_raw.shape),
        )

    note(f"fitting: {steps} Adam steps over {n_views} views "
         f"({res*res*n_views} rays, {int(gt.density_raw.shape[0])} slots)")
    t0 = time.time()
    fitted, history = fit(dev, views, start, steps=steps, lr=0.05,
                          max_segments=K)
    t_fit = time.time() - t0  # includes the end-of-loop history readback
    note(f"fit done: {t_fit:.1f}s ({steps/t_fit:.2f} steps/s) "
         f"loss {history[0]:.5f} -> {history[-1]:.6f}")

    # PSNR per view under the fitted params (post-fit; readbacks are free).
    psnrs = []
    for i, (o, d, target) in enumerate(views):
        out = render_soft(dev, fitted, o, d, max_segments=K)["rgb"]
        mse = float(jnp.mean((out - target) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        if i == 0:
            stem = out_name[:-5] if out_name.endswith(".json") else out_name
            stem = stem.replace("_result", "")
            img = np.clip(np.asarray(out).reshape(res, res, 3), 0, 1)
            tgt = np.clip(np.asarray(target).reshape(res, res, 3), 0, 1)
            save_png(os.path.join(HERE, f"{stem}_view0.png"),
                     (img * 255).astype(np.uint8))
            save_png(os.path.join(HERE, f"{stem}_target0.png"),
                     (tgt * 255).astype(np.uint8))
    psnr_mean = float(np.mean(psnrs))

    # PSNR of the STARTING params on view 0, for scale.
    out0 = render_soft(dev, start, *views[0][:2], max_segments=K)["rgb"]
    mse0 = float(jnp.mean((out0 - views[0][2]) ** 2))
    psnr_start = -10.0 * np.log10(max(mse0, 1e-12))

    result = {
        "metric": "inverse_render_psnr_db",
        "value": round(psnr_mean, 2),
        "unit": "dB",
        "psnr_per_view_db": [round(p, 2) for p in psnrs],
        "psnr_start_db": round(psnr_start, 2),
        "steps": steps,
        "views": n_views,
        "resolution": res,
        "param_slots": int(gt.density_raw.shape[0]),
        "fit_wall_s": round(t_fit, 1),
        "steps_per_s": round(steps / t_fit, 3),
        "loss_first": history[0],
        "loss_last": history[-1],
        "loss_curve": [round(v, 6) for v in history[:: max(1, steps // 50)]],
        "init": init_mode,
        "targets": target_mode,
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "jax_version": jax.__version__,
        "target": ">=25 dB (BASELINE config 3)",
    }
    tmp = os.path.join(HERE, out_name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, os.path.join(HERE, out_name))
    print(json.dumps({k: result[k] for k in
                      ("metric", "value", "unit", "psnr_start_db", "steps",
                       "fit_wall_s")}))
    note(f"total wall {time.time()-t_all:.1f}s; wrote {out_name} "
         f"+ fitted/target view-0 PNGs")


if __name__ == "__main__":
    main()
