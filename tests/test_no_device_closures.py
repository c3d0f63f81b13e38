"""No jitted hot-path function may bake a device array in as a closure
constant.

Round-3 poison bisect (tools/diag_poison.py, docs/PERF_NOTES.md): through
the axon TPU tunnel, EXECUTING any jitted executable that closed over a
device array (even 768 KB) permanently degrades all subsequent dispatch in
the process ~10^4x.  Independently of that environment bug, closure-
captured pools compile to executable constants whose in-loop gathers
serialize ~300x (PERF_NOTES single-carry cliff).  This test lowers the hot
jitted entry points with everything passed as arguments and fails if any
large constant appears in the module.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

_CONST_RE = re.compile(r"stablehlo\.constant[^:]*:\s*tensor<([0-9x]*)x?[a-z]")
_LIMIT = 16384  # elements; camera tables etc. stay far below this


def _assert_no_large_constants(lowered_text: str, where: str):
    for m in _CONST_RE.finditer(lowered_text):
        dims = [int(d) for d in m.group(1).split("x") if d]
        n = int(np.prod(dims)) if dims else 1
        assert n <= _LIMIT, (
            f"{where}: jitted module bakes in a {dims} constant "
            f"({n} elements) — a closed-over device array?  Pass it as an "
            "argument (docs/PERF_NOTES.md round-3 dispatch-poison)."
        )


def _setup():
    from octree_raymarcher_tpu.diff import init_params_from_world
    from octree_raymarcher_tpu.world.world import World

    w = World.generate(dims=(1, 1, 1), chunksize=32.0, depth=4, seed=2,
                       water_level=0.0, amplitude=8.0)
    _, dev = w.to_device()
    dev = jax.tree_util.tree_map(jnp.asarray, dev)
    params = init_params_from_world(dev)
    o = jnp.zeros((64, 3), jnp.float32).at[:, 1].set(30.0)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (64, 1))
    return dev, params, o, d


def test_detector_fires_on_deliberate_closure():
    big = jnp.zeros((65536, 3), jnp.float32)

    @jax.jit
    def bad(x):
        return ((x + big) ** 2).mean()

    txt = bad.lower(jnp.ones((65536, 3), jnp.float32)).as_text()
    with pytest.raises(AssertionError):
        _assert_no_large_constants(txt, "self-test")


def test_segment_sampler_jit_has_no_baked_pools():
    from octree_raymarcher_tpu.diff.segments import _sample_segments_jit

    dev, _, o, d = _setup()
    txt = _sample_segments_jit.lower(dev, o, d, 4, 64, 8, None, 16).as_text()
    _assert_no_large_constants(txt, "_sample_segments_jit")


def test_render_tile_jit_has_no_baked_pools():
    from octree_raymarcher_tpu.shade.lights import LightRig
    from octree_raymarcher_tpu.shade.materials import MaterialTable
    from octree_raymarcher_tpu.shade.render import RenderConfig, _render_tile

    dev, _, o, d = _setup()
    eye = jnp.zeros(3, jnp.float32)
    txt = _render_tile.lower(
        dev, o, d, eye, LightRig.default(), MaterialTable.default(),
        RenderConfig(tile=0), None, None, None,
    ).as_text()
    _assert_no_large_constants(txt, "_render_tile")


def test_fit_step_passes_views_as_arguments():
    """diff/optim.fit's jitted step must take the cached (segs, target)
    views as arguments — the r2 version closed over them."""
    from octree_raymarcher_tpu.diff.optim import photometric_loss, sample_views

    dev, params, o, d = _setup()
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    cached = sample_views(dev, [(o, d, target)], max_segments=4)
    opt = optax.adam(1e-2)

    @jax.jit
    def step(p, s, cached):
        loss, g = jax.value_and_grad(photometric_loss)(p, cached)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    txt = step.lower(params, opt.init(params), cached).as_text()
    _assert_no_large_constants(txt, "fit.step")


def test_scene_train_step_takes_world_as_argument():
    from octree_raymarcher_tpu.models.scene import VoxelScene

    scene = VoxelScene.demo(chunk_size=16.0, depth=4)
    train_step, opt_state = scene.make_train_step()
    _, params, o, d = _setup()
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    txt = train_step.lower(
        scene.world, scene.params, opt_state, o, d, target
    ).as_text()
    _assert_no_large_constants(txt, "VoxelScene.train_step")
