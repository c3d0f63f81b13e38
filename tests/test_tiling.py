"""Block ray-ordering permutation properties."""

import numpy as np

from octree_raymarcher_tpu.shade.tiling import block_permutation


def test_block_permutation_roundtrip():
    for h, w, b in ((4, 6, 2), (17, 31, 8), (1080, 1920, 128)):
        perm, inv = block_permutation(h, w, b)
        assert perm.shape == (h * w,)
        a = np.arange(h * w)
        assert (a[perm][inv] == a).all()
        assert sorted(perm) == list(range(h * w))


def test_block_permutation_groups_tiles():
    perm, _ = block_permutation(4, 6, 2)
    r = np.arange(24)[perm]
    # first block = pixels (0..1, 0..1) of a 6-wide image
    assert list(r[:4]) == [0, 1, 6, 7]
