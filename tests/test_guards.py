"""checkify NaN/OOB guard tests (SURVEY §5 commitment): adversarial inputs
must raise a descriptive error in checked mode, and degenerate worlds must
render without poisoning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.checkify import JaxRuntimeError

from octree_raymarcher_tpu.core.chunk import Chunk
from octree_raymarcher_tpu.ops import march
from octree_raymarcher_tpu.ops.guards import composite_checked, march_checked
from octree_raymarcher_tpu.world import single_chunk_world


@pytest.fixture(scope="module")
def dworld():
    from octree_raymarcher_tpu.worldgen import BoundsPyramid, grow

    pyr = BoundsPyramid.generate(size=16, amplitude=6.0, period=1.0 / 16,
                                 xshift=0.0, yshift=4.0, zshift=0.0, seed=2)
    return single_chunk_world(grow([0.0, 0.0, 0.0], 16.0, depth=4, pyr=pyr))


def _rays(n=32):
    rng = np.random.default_rng(0)
    o = rng.uniform(0, 16, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_checked_march_passes_clean_inputs(dworld):
    o, d = _rays()
    r = march_checked(dworld, o, d)
    plain = march(dworld, o, d)
    np.testing.assert_array_equal(np.asarray(r.hit), np.asarray(plain.hit))


def test_checked_march_rejects_nan_dirs(dworld):
    o, d = _rays()
    d[3, 1] = np.nan
    with pytest.raises(JaxRuntimeError, match="non-finite ray direction"):
        march_checked(dworld, o, d)


def test_checked_march_rejects_nan_origins(dworld):
    o, d = _rays()
    o[0, 0] = np.inf
    with pytest.raises(JaxRuntimeError, match="non-finite ray origin"):
        march_checked(dworld, o, d)


def test_checked_march_rejects_zero_dirs(dworld):
    o, d = _rays()
    d[5] = 0.0
    with pytest.raises(JaxRuntimeError, match="zero-length ray direction"):
        march_checked(dworld, o, d)


def test_empty_world_renders_all_misses():
    """A world of one all-EMPTY chunk: every ray misses, nothing NaNs."""
    empty = Chunk.empty_chunk((0.0, 0.0, 0.0), 16.0, depth=4)
    dev = single_chunk_world(empty)
    o, d = _rays()
    r = march_checked(dev, o, d)
    assert not np.asarray(r.hit).any()
    from octree_raymarcher_tpu.shade import render

    out = render(dev, o, d, (0.0, 0.0, 0.0))
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_checked_composite_flags_bad_slots(dworld):
    from octree_raymarcher_tpu.diff import (
        init_params_from_world,
        sample_segments,
    )

    o, d = _rays()
    segs = sample_segments(dworld, o, d, max_segments=4)
    params = init_params_from_world(dworld)
    out = composite_checked(segs, params)  # clean case passes
    assert np.isfinite(np.asarray(out["rgb"])).all()

    bad = segs.replace(
        slot=jnp.where(segs.slot >= 0, segs.slot + params.num_slots, segs.slot)
    )
    with pytest.raises(JaxRuntimeError, match="slot out of range"):
        composite_checked(bad, params)
