"""Evidence that the overlapped grad reduction can actually overlap
(VERDICT r2 missing #4).

What can and cannot be proven on this hardware:

* The CODE property (testable everywhere, asserted here): the overlapped
  step LOWERS to ``grad_tiles`` INDEPENDENT per-tile gradient psums plus
  one loss psum — each tile's collective depends only on that tile's
  backward, which is exactly what a latency-hiding scheduler needs to
  pipeline comm under the next tile's compute.  If a refactor ever merges
  the tile loop back into one big backward + one psum, this test fails.

* The COMPILED property (TPU, via deviceless AOT for a v5e:2x2
  topology): XLA:TPU *reassociates* naive per-tile psums into one
  end-of-step all-reduce at any size; make_sharded_train_step's
  optimization_barrier blocks that, and the second test asserts the
  per-tile collectives survive the full TPU optimization pipeline at
  realistic gradient sizes.  (At toy sizes the size-thresholded COMBINER
  still tuples them — also observed on the CPU backend — hence the
  inflated params.)  Details: docs/PERF_NOTES.md round-3 overlap notes.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from octree_raymarcher_tpu.diff import init_params_from_world
from octree_raymarcher_tpu.parallel.mesh import make_mesh
from octree_raymarcher_tpu.parallel.render_sharded import (
    make_sharded_train_step,
)
from octree_raymarcher_tpu.shade.camera import PerspectiveCamera
from octree_raymarcher_tpu.world.world import World

GRAD_TILES = 4


def _setup():
    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=5, seed=5,
                       water_level=0.0, amplitude=12.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    cam = PerspectiveCamera(position=(16.0, 26.0, -12.0), pitch_deg=-35.0,
                            fov_deg=70.0, width=32, height=16)
    o, d = map(jnp.asarray, cam.rays())
    params = init_params_from_world(dev, solid_density=10.0)
    t = jnp.zeros((o.shape[0], 3), dtype=jnp.float32)
    return dev, o, d, params, t


def test_overlapped_step_lowers_to_per_tile_psums():
    dev, o, d, params, t = _setup()
    mesh = make_mesh(jax.devices()[:8])
    opt = optax.adam(1e-2)

    def count_all_reduces(step):
        txt = step.lower(params, opt.init(params), dev, o, d, t).as_text()
        return len(re.findall(r"\ball_reduce\b|stablehlo\.all_reduce", txt))

    step_olap = make_sharded_train_step(
        mesh, dev, opt, max_segments=8, overlap=True, grad_tiles=GRAD_TILES
    )
    n_olap = count_all_reduces(step_olap)
    step_block = make_sharded_train_step(mesh, dev, opt, max_segments=8,
                                         overlap=False)
    n_block = count_all_reduces(step_block)

    # Blocking: one grad psum (pytree leaves may lower fused or split) plus
    # one loss psum.  Overlapped: one psum PER TILE plus the loss psum.
    assert n_olap >= n_block + GRAD_TILES - 1, (n_olap, n_block)
    assert n_olap >= GRAD_TILES + 1, n_olap


@pytest.mark.slow
def test_overlapped_step_tpu_collectives_survive_compilation():
    """TPU-compiled HLO check, via deviceless AOT compilation for a
    v5e:2x2 topology (works through the axon plugin; skips loudly where no
    TPU topology is available).

    What is asserted: the per-tile gradient psums SURVIVE the XLA:TPU
    optimization pipeline as >= GRAD_TILES separate all-reduce ops.
    Without the optimization_barrier in make_sharded_train_step, XLA
    reassociates psum(g0)+psum(g1) -> psum(g0+g1) and emits ONE all-reduce
    after all backward work (observed on this stack even at 256 MB/tile)
    — total comm/compute serialization.  Separate per-tile ops are the
    prerequisite the latency-hiding scheduler needs; async start/done
    pairs are a runtime/scheduling detail this XLA version does not
    expose in compiled.as_text().

    Params are inflated to 16M slots: at toy sizes the all-reduce
    COMBINER (a different pass, size-thresholded, which the barrier does
    not and should not block) legally tuples the per-tile ops back
    together; at the real workload's ~256 MB/tile the ops stay separate
    — that is the regime that matters for overlap."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2"
        )
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"no TPU topology for AOT compile here: {e!r}")

    from octree_raymarcher_tpu.diff.composite import VoxelParams

    dev, o, d, _, t = _setup()
    P = 1 << 24
    params = VoxelParams(
        density_raw=jnp.zeros(P, jnp.float32),
        albedo_raw=jnp.zeros((P, 3), jnp.float32),
    )
    mesh = make_mesh(np.array(topo.devices[:4]))
    opt = optax.adam(1e-2)
    step = make_sharded_train_step(
        mesh, dev, opt, max_segments=8, overlap=True, grad_tiles=GRAD_TILES
    )
    compiled = step.lower(params, opt.init(params), dev, o, d, t).compile()
    txt = compiled.as_text()
    n_ar = len(re.findall(r"all-reduce\(", txt))
    assert n_ar >= GRAD_TILES, (
        f"only {n_ar} all-reduce ops in TPU HLO — XLA merged the per-tile "
        "grad psums back into a blocking end-of-step reduction"
    )
