"""Native C++ helpers vs numpy/scipy oracles."""
import numpy as np
import pytest

from tpuseg import native
from tpuseg.evaluation.metrics import fast_hist as np_fast_hist


def test_native_builds():
    assert native.available(), "g++ build of fasthist.cpp failed"


def test_fast_hist_matches_numpy(rng):
    pred = rng.randint(0, 19, 100000).astype(np.int32)
    gt = rng.randint(0, 19, 100000).astype(np.int32)
    gt[::7] = 255
    np.testing.assert_array_equal(native.fast_hist(pred, gt, 19),
                                  np_fast_hist(pred, gt, 19))


def test_tile_centroids_match_scipy(rng):
    from scipy.ndimage import center_of_mass

    mask = rng.randint(0, 6, (128, 256)).astype(np.uint8)
    mask[mask == 5] = 255  # ignore
    tile = 64
    got = native.tile_class_centroids(mask, tile, 5)

    want: dict = {}
    for ty in range(128 // tile):
        for tx in range(256 // tile):
            patch = mask[ty * tile:(ty + 1) * tile,
                         tx * tile:(tx + 1) * tile]
            for c in np.unique(patch):
                if c >= 5:
                    continue
                cy, cx = center_of_mass((patch == c).astype(np.int32))
                want.setdefault(int(c), []).append(
                    (int(cx) + tx * tile, int(cy) + ty * tile))
    assert set(got) == set(want)
    for c in want:
        assert sorted(got[c]) == sorted(want[c]), c


def test_remap_matches_numpy(rng):
    mask = rng.randint(0, 256, (512, 512)).astype(np.uint8)
    table = rng.randint(0, 256, 256).astype(np.uint8)
    np.testing.assert_array_equal(native.remap(mask, table), table[mask])


def test_centroid_speedup(rng):
    """The point of going native: a 1024x2048 mask must process fast."""
    import time

    mask = rng.randint(0, 19, (1024, 2048)).astype(np.uint8)
    t0 = time.perf_counter()
    native.tile_class_centroids(mask, 1024, 19)
    native_t = time.perf_counter() - t0
    assert native_t < 0.5, f"native centroid pass too slow: {native_t:.3f}s"
