"""Headline benchmark: forward raymarch+shade throughput at 1080p.

Workload mirrors the reference's default scene (Main.cpp:38,80): a 4x4x4
chunk grid of 128^3-voxel octrees (512^3 addressable voxels, depth 8) from
simplex terrain, rendered through a 1920x1080 perspective camera.  Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against bench_baseline.json (written on first run, so
later rounds report their speedup over the first recorded number).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def note(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def build_world():
    from octree_raymarcher_tpu.world.device import DeviceWorld
    from octree_raymarcher_tpu.world.world import World

    # Reference default scene: 4x4x4 chunks x 128^3 voxels, depth 8, with the
    # water flood (Main.cpp:80, World.cpp:11,316-321).  The packed pools are
    # cached on disk (~30 s to rebuild, scene is deterministic in the seed).
    cache = os.path.join(os.path.dirname(__file__), ".bench_world.npz")
    if os.path.exists(cache):
        try:
            z = np.load(cache)
            z["tree"]
        except Exception:
            os.remove(cache)
            return build_world()
        return DeviceWorld(
            tree=z["tree"], twig=z["twig"], twig_occ=z["twig_occ"],
            chunk_bmin=z["chunk_bmin"], chunk_tree=z["chunk_tree"],
            chunk_twig=z["chunk_twig"], chunkcoordmin=z["chunkcoordmin"],
            chunksize=float(z["chunksize"]), dims=tuple(int(v) for v in z["dims"]),
            depth=int(z["depth"]),
        )
    w = World.generate(dims=(4, 4, 4), chunksize=128.0, depth=8, seed=0,
                       water_level=6.0, amplitude=64.0)
    _, dev = w.to_device(slack=1.0, device=False)
    # atomic write so an interrupted run can't leave a corrupt cache
    np.savez(
        cache + ".tmp.npz",
        tree=dev.tree, twig=dev.twig, twig_occ=dev.twig_occ,
        chunk_bmin=dev.chunk_bmin, chunk_tree=dev.chunk_tree,
        chunk_twig=dev.chunk_twig, chunkcoordmin=dev.chunkcoordmin,
        chunksize=dev.chunksize, dims=np.asarray(dev.dims), depth=dev.depth,
    )
    os.replace(cache + ".tmp.npz", cache)
    return dev


def main():
    import jax
    import jax.numpy as jnp

    from octree_raymarcher_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render_frame

    t0 = time.time()
    note("building world")
    world = build_world()
    note(f"world built ({time.time()-t0:.1f}s); transferring pools")
    world = jax.tree_util.tree_map(jnp.asarray, world)
    jax.block_until_ready(world.tree)
    t_world = time.time() - t0
    note(f"pools on device ({t_world:.1f}s total)")

    cam = PerspectiveCamera(
        position=(256.0, 90.0, -80.0), yaw_deg=0.0, pitch_deg=-12.0,
        fov_deg=80.0, width=1920, height=1080,
    )
    origins, dirs = cam.rays()
    n_rays = origins.shape[0]
    # Screen-block ray order: spatially-coherent rays share march tiles so
    # each tile's loop exits at a local worst ray (same compiled executable —
    # the permutation is host-side data movement only).
    block = int(os.environ.get("BENCH_BLOCK", "128"))
    if block > 0:
        from octree_raymarcher_tpu.shade.tiling import block_permutation

        perm, _ = block_permutation(cam.height, cam.width, block)
        origins, dirs = origins[perm], dirs[perm]
    eye = jnp.asarray(cam.position, dtype=jnp.float32)
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    resident = os.environ.get("BENCH_RESIDENT", "1") == "1"
    cfg = RenderConfig(shadow="none", max_steps=512, assume_resident=resident)
    tile = int(os.environ.get("BENCH_TILE", "65536"))

    # Host-tiled frame (render_frame): one per-tile executable, tiles
    # dispatched asynchronously from the host.  The world travels as a jit
    # argument and the march loop stays top-level per tile — both required
    # for vectorized pool gathers (docs/PERF_NOTES.md).
    def frame(w, o, d):
        return render_frame(w, o, d, eye, cfg=cfg, tile=tile)["rgb"]

    # IMPORTANT: no device->host readback (np.asarray/float) is allowed until
    # after the timed loop.  Through the axon TPU tunnel, the FIRST readback
    # permanently switches the process to synchronous per-kernel dispatch
    # (~40-400us overhead per kernel execution, measured 2026-08-17), which
    # is tunnel overhead, not TPU time.  block_until_ready() does not trigger
    # it, so warmup+timing below measure true pipelined device performance.
    t0 = time.time()
    note("compiling 1080p tile (persistent cache: .jax_cache)")
    out = jax.block_until_ready(frame(world, origins, dirs))
    t_compile = time.time() - t0
    note(f"first frame done ({t_compile:.1f}s total); timing")

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = frame(world, origins, dirs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    rays_per_s = n_rays / dt

    # --- the reference's TRUE frame workloads (VERDICT r2 missing #3) -------
    # The reference marches the octree TWICE per frame (shadow pass + main
    # pass, Main.cpp:190-235) and samples a texture atlas + sky in the main
    # shader.  Time those modes too, before any readback (axon rule).
    modes = {}
    if os.environ.get("BENCH_MODES", "1") == "1":
        from octree_raymarcher_tpu.shade.atlas import default_atlas
        from octree_raymarcher_tpu.shade.envmap import default_envmap

        atlas = jnp.asarray(default_atlas(resolution=32))
        envmap = jnp.asarray(default_envmap(64, 128))
        variants = {
            # two marches/frame: 512^2-ray light-depth pass + screen pass
            "shadow_map": dict(cfg=RenderConfig(
                shadow="map", max_steps=512, assume_resident=resident)),
            # two full-screen marches: camera rays + per-hit shadow rays
            "shadow_ray": dict(cfg=RenderConfig(
                shadow="ray", max_steps=512, assume_resident=resident)),
            # the full reference frame: shadowed + atlas-textured + env sky
            "full_frame": dict(cfg=RenderConfig(
                shadow="map", max_steps=512, assume_resident=resident),
                atlas=atlas, envmap=envmap),
        }
        mode_iters = 3
        for name, kw in variants.items():
            note(f"mode {name}: compiling")
            mcfg = kw.pop("cfg")

            def mframe(w, o, d, kw=kw, mcfg=mcfg):
                return render_frame(w, o, d, eye, cfg=mcfg, tile=tile, **kw)[
                    "rgb"
                ]

            t0 = time.time()
            mout = jax.block_until_ready(mframe(world, origins, dirs))
            note(f"mode {name}: first frame {time.time()-t0:.1f}s; timing")
            t0 = time.time()
            for _ in range(mode_iters):
                mout = mframe(world, origins, dirs)
            jax.block_until_ready(mout)
            mdt = (time.time() - t0) / mode_iters
            modes[name] = {
                "rays_per_s": round(n_rays / mdt),
                "frame_ms": round(mdt * 1e3, 1),
            }

    # ---- readbacks allowed from here on ------------------------------------
    hit_frac = 1.0 - float(np.isclose(np.asarray(out), np.asarray(cfg.sky)).all(-1).mean())

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = rays_per_s
        json.dump(
            {"metric": "fwd_rays_per_s_1080p", "value": rays_per_s},
            open(baseline_path, "w"),
        )
    print(
        json.dumps(
            {
                "metric": "fwd_rays_per_s_1080p",
                "value": round(rays_per_s),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / base, 3),
            }
        )
    )
    print(
        f"# world_build={t_world:.2f}s compile={t_compile:.1f}s "
        f"frame={dt*1e3:.1f}ms hit_frac={hit_frac:.2f} "
        f"device={jax.devices()[0].device_kind}",
        flush=True,
    )
    if modes:
        for name, rec in modes.items():
            print(f"# mode {name}: {rec['rays_per_s']/1e6:.1f}M rays/s "
                  f"({rec['frame_ms']} ms/frame)", flush=True)
        modes["plain"] = {
            "rays_per_s": round(rays_per_s),
            "frame_ms": round(dt * 1e3, 1),
        }
        modes["_meta"] = {
            "resolution": "1920x1080",
            "device": jax.devices()[0].device_kind,
            "note": ("shadow_map/full_frame = reference two-march frame "
                     "(Main.cpp:190-235); full_frame adds atlas texturing + "
                     "equirect env sky"),
        }
        json.dump(
            modes,
            open(os.path.join(os.path.dirname(__file__),
                              "bench_frame_modes.json"), "w"),
            indent=1,
        )


if __name__ == "__main__":
    main()
