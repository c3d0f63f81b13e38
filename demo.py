"""Scripted engine session — the app-layer analog of the reference's
interactive loop (src/Main.cpp:68-262: fly camera, x/z/c edits at the picked
cursor, g LOD swap, 1-6 world shifts, HUD) driven as a deterministic script:
orbit the camera over a generated world, pick the surface under the view ray
and carve/build/replace there, swap a chunk for its LOD, stream the world,
and write every frame as PNG plus per-frame metrics to JSONL.

Usage:  python demo.py [--frames N] [--out DIR] [--res WxH]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def save_png(path: str, rgb01: np.ndarray) -> None:
    arr = (np.clip(rgb01, 0.0, 1.0) * 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:  # pragma: no cover - PIL is present in this image
        np.save(path + ".npy", arr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--res", default="320x180")
    ap.add_argument("--dims", default="2x2x2")
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--platform", default="default", choices=("default", "cpu"))
    args = ap.parse_args(argv)
    width, height = (int(v) for v in args.res.split("x"))
    dims = tuple(int(v) for v in args.dims.split("x"))

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.shade.render import RenderConfig, render
    from octree_raymarcher_tpu.utils.metrics import MetricsLogger
    from octree_raymarcher_tpu.world import World, lod
    from octree_raymarcher_tpu.world.pick import cursor_box, pick

    os.makedirs(args.out, exist_ok=True)
    log = MetricsLogger(os.path.join(args.out, "metrics.jsonl"))

    t0 = time.time()
    w = World.generate(dims=dims, chunksize=64.0, depth=args.depth, seed=0,
                       water_level=6.0, amplitude=32.0)
    wa, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    log.log("world", seconds=time.time() - t0, **w.memory_report())

    cs = 64.0
    cx = dims[0] * cs / 2
    cz = dims[2] * cs / 2
    radius = max(dims[0], dims[2]) * cs * 0.9
    cfg = RenderConfig(shadow="ray")

    from octree_raymarcher_tpu.shade import default_atlas, save_atlas_png
    from octree_raymarcher_tpu.shade.envmap import default_envmap
    from octree_raymarcher_tpu.shade.render import render_frame

    # Textured + environment-lit session (reference: PNG atlas Atlas.cpp:29
    # + cubemap skybox Skybox.cpp:84-107); the atlas sheet is also saved so
    # the PNG load path is exercised end to end.
    atlas = jnp.asarray(default_atlas(resolution=32))
    save_atlas_png(os.path.join(args.out, "atlas.png"), np.asarray(atlas))
    envmap = jnp.asarray(default_envmap(64, 128))

    def frame_fn(dv, o, d, eye):
        # host-tiled fast path (render_frame); jit caching is internal
        return render_frame(dv, o, d, eye, cfg=cfg, atlas=atlas,
                            envmap=envmap)["rgb"]

    mats = [2, 3, 4, 5]
    for i in range(args.frames):
        ang = 2 * math.pi * i / max(args.frames, 1)
        eye = (cx + radius * math.cos(ang), dims[1] * cs * 0.55,
               cz + radius * math.sin(ang))
        # camera convention: forward = (sin yaw, 0, cos yaw) at pitch 0
        yaw = math.degrees(math.atan2(cx - eye[0], cz - eye[2]))
        cam = PerspectiveCamera(
            position=eye, yaw_deg=yaw, pitch_deg=-25.0,
            fov_deg=70.0, width=width, height=height,
        )
        o, d = cam.rays()
        t0 = time.time()
        img = np.asarray(
            jax.block_until_ready(
                frame_fn(dev, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(eye, dtype=jnp.float32))
            )
        ).reshape(height, width, 3)
        dt = time.time() - t0
        log.counter("frame_s").add(dt)
        log.log("frame", i=i, seconds=dt, rays=width * height,
                rays_per_s=width * height / dt)
        save_png(os.path.join(args.out, f"frame_{i:03d}.png"), img)

        # Every 3rd frame: pick the surface mid-screen and edit there
        # (reference keys x/z/c at the ImaginaryCube cursor).
        if i % 3 == 1:
            center_dir = d.reshape(height, width, 3)[height // 2, width // 2]
            p = pick(w, eye, center_dir, cursor_scale=6.0)
            if p is not None:
                bmin, bmax = cursor_box(p)
                op = ("destroy", "build", "replace")[(i // 3) % 3]
                if op == "destroy":
                    edits = w.destroy(bmin, bmax)
                elif op == "build":
                    edits = w.build(bmin, bmax + 8.0, mats[(i // 3) % len(mats)])
                else:
                    edits = w.replace(bmin, bmax, mats[(i // 3) % len(mats)])
                dev = w.apply(wa, dev, edits)
                log.log("edit", op=op, chunks=len(edits),
                        box=[bmin.tolist(), np.asarray(bmax).tolist()])

        # Mid-way: LOD-swap the chunk under the camera (reference key g).
        if i == args.frames // 2:
            ci = w.index(*w.index_float((cx, 10.0, cz)))
            t0 = time.time()
            w.chunks[ci] = lod(w.chunks[ci])
            from octree_raymarcher_tpu.core.chunk import Dirty

            dev = wa.modify(dev, ci, w.chunks[ci], Dirty(realloc=True),
                            Dirty(realloc=True))
            log.log("lod", chunk=ci, seconds=time.time() - t0,
                    **w.chunks[ci].memory_report())

        # Late: stream the world one chunk +x (reference keys 1-6).
        if i == args.frames - 3:
            t0 = time.time()
            touched = w.shift(0, +1)
            dev = w.apply_shift(wa, dev, touched)
            log.log("shift", axis=0, chunks=len(touched),
                    seconds=time.time() - t0)

    w.save(os.path.join(args.out, "world.npz"))
    log.log("done", occupancy=wa.occupancy(), frames=args.frames)
    stats = log.counter("frame_s").stats()
    print(json.dumps({"frames": args.frames,
                      "avg_frame_s": round(stats["avg"], 4),
                      "out": args.out}))
    log.close()


if __name__ == "__main__":
    main()
