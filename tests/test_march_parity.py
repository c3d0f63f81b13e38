"""Parity: vectorized XLA marcher vs the scalar CPU oracle.

This is the formal version of the reference's informal CPU-vs-GPU dual
implementation cross-check (SURVEY.md §4): same world, same rays, assert the
hit mask, hit distance and material agree.
"""

import numpy as np
import pytest

from octree_raymarcher_tpu.march import cpu_ref
from octree_raymarcher_tpu.ops.march_jnp import march
from octree_raymarcher_tpu.shade.camera import OrthoCamera, PerspectiveCamera
from octree_raymarcher_tpu.world.device import single_chunk_world
from octree_raymarcher_tpu.worldgen import BoundsPyramid, grow


@pytest.fixture(scope="module")
def chunk():
    pyr = BoundsPyramid.generate(
        size=64, amplitude=16.0, period=1.0 / 64, xshift=0.0, yshift=24.0,
        zshift=0.0, seed=5,
    )
    return grow([0.0, 0.0, 0.0], 64.0, depth=6, pyr=pyr)


@pytest.fixture(scope="module")
def dworld(chunk):
    return single_chunk_world(chunk)


def _compare(chunk, dworld, origins, dirs, n_check=None):
    res = march(dworld, origins, dirs)
    hit = np.asarray(res.hit)
    t = np.asarray(res.t)
    mat = np.asarray(res.material)

    idxs = range(len(origins)) if n_check is None else np.linspace(
        0, len(origins) - 1, n_check
    ).astype(int)

    mism = 0
    for i in idxs:
        class W:  # minimal world adapter for the oracle
            chunksize = chunk.size
            dims = (1, 1, 1)
            chunkcoordmin = np.round(chunk.position / chunk.size).astype(int)

            @staticmethod
            def chunk_at(x, y, z):
                return chunk

        h = cpu_ref.chunkmarch(W, origins[i], dirs[i])
        if h.hit != bool(hit[i]):
            mism += 1
            continue
        if h.hit:
            if not np.isclose(h.t, t[i], rtol=2e-3, atol=2e-3):
                mism += 1
            elif h.material != int(mat[i]):
                mism += 1
    return mism, len(list(idxs))


def test_ortho_topdown_parity(chunk, dworld):
    cam = OrthoCamera(
        position=(32.0, 80.0, 32.0), direction=(0, -1, 0), up=(0, 0, 1),
        width=63.0, height=63.0, xres=32, yres=32,
    )
    origins, dirs = cam.rays()
    mism, total = _compare(chunk, dworld, origins, dirs)
    assert mism <= total // 100, f"{mism}/{total} rays disagree with oracle"


def test_ortho_side_parity(chunk, dworld):
    cam = OrthoCamera(
        position=(-20.0, 24.0, 32.0), direction=(1, 0, 0), up=(0, 1, 0),
        width=63.0, height=63.0, xres=32, yres=32,
    )
    origins, dirs = cam.rays()
    mism, total = _compare(chunk, dworld, origins, dirs)
    assert mism <= total // 100, f"{mism}/{total} rays disagree with oracle"


def test_perspective_parity(chunk, dworld):
    cam = PerspectiveCamera(
        position=(32.0, 40.0, -10.0), yaw_deg=0.0, pitch_deg=-25.0,
        fov_deg=80.0, width=24, height=24,
    )
    origins, dirs = cam.rays()
    mism, total = _compare(chunk, dworld, origins, dirs, n_check=200)
    assert mism <= max(2, total // 50), f"{mism}/{total} rays disagree with oracle"


def test_miss_rays(dworld):
    # Rays pointing away from the world must all miss quickly.
    origins = np.tile(np.array([[32.0, 100.0, 32.0]], dtype=np.float32), (16, 1))
    dirs = np.tile(np.array([[0.0, 1.0, 0.0]], dtype=np.float32), (16, 1))
    res = march(dworld, origins, dirs)
    assert not np.asarray(res.hit).any()
    assert np.isinf(np.asarray(res.t)).all()


def test_inside_solid_start(chunk, dworld):
    # A ray starting deep underground hits immediately (t ~ 0).
    origins = np.array([[32.0, 1.0, 32.0]], dtype=np.float32)
    dirs = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
    res = march(dworld, origins, dirs)
    assert bool(np.asarray(res.hit)[0])
    assert float(np.asarray(res.t)[0]) < 1e-3
