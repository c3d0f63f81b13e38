"""Real multi-PROCESS distributed test (SURVEY §2.8 multi-host scaling):
two jax.distributed CPU processes, 2 virtual devices each, form a 4-device
global mesh and run BOTH the overlapped sharded train step and the ZeRO
(reduce_scatter + sharded-Adam + all_gather) step; the results must match
the same steps computed single-process.

This is the strongest multi-host evidence available on a 1-chip host: the
collectives (psum over the rays axis) actually cross process boundaries
through the distributed runtime instead of staying inside one XLA client.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp_result.npz")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_ENABLE_X64"] = "0"

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py"),
             str(pid), str(port), out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    assert os.path.exists(out), logs[0][-4000:]
    mp = np.load(out)

    # Single-process reference on 4 of this process's virtual devices.
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, PartitionSpec  # noqa: F401

    from octree_raymarcher_tpu.diff import init_params_from_world
    from octree_raymarcher_tpu.parallel.mesh import make_mesh
    from octree_raymarcher_tpu.parallel.render_sharded import (
        make_sharded_train_step,
        make_zero_train_step,
    )
    from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
    from octree_raymarcher_tpu.world.world import World

    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=12.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)

    cam = PerspectiveCamera(position=(16.0, 26.0, -12.0), pitch_deg=-35.0,
                            fov_deg=70.0, width=16, height=8)
    origins, dirs = cam.rays()
    targets = jnp.zeros((origins.shape[0], 3), dtype=jnp.float32)

    mesh = make_mesh(jax.devices()[:4])
    params = init_params_from_world(dev, solid_density=10.0)
    opt = optax.adam(1e-2)
    step = make_sharded_train_step(mesh, dev, opt, max_segments=4,
                                   overlap=True, grad_tiles=2)
    params, _, loss = step(params, opt.init(params), dev,
                           jnp.asarray(origins), jnp.asarray(dirs), targets)

    np.testing.assert_allclose(float(loss), float(mp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params.density_raw), mp["density_raw"], rtol=1e-5,
        atol=1e-6,
        err_msg="multi-process step diverged from single-process step",
    )
    np.testing.assert_allclose(
        np.asarray(params.albedo_raw), mp["albedo_raw"], rtol=1e-5, atol=1e-6,
    )

    # ZeRO step cross-process vs the same two steps single-process.
    zparams = init_params_from_world(dev, solid_density=10.0)
    init_zero, zstep = make_zero_train_step(mesh, dev, opt, max_segments=4,
                                            grad_tiles=2)
    zstate = init_zero(zparams)
    for _ in range(2):
        zparams, zstate, zloss = zstep(zparams, zstate, dev,
                                       jnp.asarray(origins),
                                       jnp.asarray(dirs), targets)
    np.testing.assert_allclose(float(zloss), float(mp["zero_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(zparams.density_raw), mp["zero_density_raw"], rtol=1e-5,
        atol=1e-6,
        err_msg="multi-process ZeRO step diverged from single-process",
    )
    np.testing.assert_allclose(
        np.asarray(zparams.albedo_raw), mp["zero_albedo_raw"], rtol=1e-5,
        atol=1e-6,
    )
