"""Native map-compilation kernels (csrc/mapkit.cpp) vs the numpy/scipy path.

The C++ library is the hot path of the offline asset compiler (the TPU
build's replacement for the reference's lanelet2 C++ map stack, reference
Dockerfile:22); these tests pin it bit-for-bit (or within float tolerance)
against the pure-Python fallback implementations in maps/compile.py.
"""

import numpy as np
import pytest
from scipy import ndimage

from torchdriveenv_tpu.maps import native
from torchdriveenv_tpu.maps.compile import stamp_segment

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_binary(g, p, seed):
    rng = np.random.RandomState(seed)
    return (rng.rand(g, g) < p).astype(np.uint8)


class TestEdt:
    @pytest.mark.parametrize("p,seed", [(0.01, 0), (0.2, 1), (0.9, 2)])
    def test_matches_scipy(self, p, seed):
        src = _random_binary(96, p, seed)
        dist, idx = native.edt(src)
        # scipy: distance to nearest zero of input -> pass inverted source
        ref = ndimage.distance_transform_edt(1 - src)
        np.testing.assert_allclose(dist, ref, rtol=1e-5, atol=1e-5)
        # nearest_idx must point at a source pixel at exactly that distance
        ii, jj = np.divmod(idx.ravel(), src.shape[1])
        assert src[ii, jj].all()
        gi, gj = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        d_claim = np.hypot(gi.ravel() - ii, gj.ravel() - jj)
        np.testing.assert_allclose(d_claim.reshape(dist.shape), dist,
                                   rtol=1e-5, atol=1e-5)

    def test_empty_grid(self):
        src = np.zeros((32, 32), np.uint8)
        dist, idx = native.edt(src)
        assert (idx == -1).all()
        assert (dist > 1e9).all()

    def test_single_pixel(self):
        src = np.zeros((64, 64), np.uint8)
        src[10, 50] = 1
        dist, idx = native.edt(src)
        assert dist[10, 50] == 0.0
        assert idx[10, 50] == 10 * 64 + 50
        np.testing.assert_allclose(dist[0, 0], np.hypot(10, 50), rtol=1e-6)


class TestSdf:
    def test_matches_scipy(self):
        drv = _random_binary(128, 0.4, 3)
        drv = ndimage.binary_closing(drv, iterations=2).astype(np.uint8)
        out = native.sdf(drv, 0.5)
        inside = ndimage.distance_transform_edt(drv) * 0.5
        outside = ndimage.distance_transform_edt(1 - drv) * 0.5
        np.testing.assert_allclose(out, (inside - outside).astype(np.float32),
                                   rtol=1e-5, atol=1e-5)


class TestStampSegments:
    def test_matches_numpy_stamp(self):
        rng = np.random.RandomState(4)
        g, scale = 160, 0.5
        origin = np.array([-30.0, -30.0])
        n = 25
        p0 = rng.uniform(-25, 45, (n, 2))
        p1 = p0 + rng.uniform(-20, 20, (n, 2))
        hw = rng.uniform(1.5, 4.0, (n,))

        drv_n = np.zeros((g, g), np.uint8)
        bd_n = np.full((g, g), 1e9, np.float32)
        ang_n = np.zeros((g, g), np.float32)
        native.stamp_segments(g, origin, scale, p0, p1, hw, drv_n, bd_n, ang_n)

        drv_p = np.zeros((g, g), bool)
        bd_p = np.full((g, g), 1e9, np.float64)
        ang_p = np.zeros((g, g), np.float64)
        for k in range(n):
            stamp_segment(drv_p, bd_p, ang_p, p0[k], p1[k], hw[k],
                          origin, scale)

        np.testing.assert_array_equal(drv_n.astype(bool), drv_p)
        covered = bd_p < 1e8
        assert covered.any()
        # where the closest segment is unambiguous the angles agree; allow a
        # tiny fraction of float32-vs-float64 tie flips on equidistant pixels
        mism = covered & ~np.isclose(ang_n, ang_p, atol=1e-5)
        assert mism.mean() < 5e-3

    def test_propagate_dir_matches_scipy(self):
        rng = np.random.RandomState(5)
        covered = _random_binary(96, 0.05, 6)
        ang = rng.uniform(-np.pi, np.pi, (96, 96)).astype(np.float32)
        out = native.propagate_dir(covered, ang)
        _, idx = ndimage.distance_transform_edt(1 - covered,
                                                return_indices=True)
        ref = ang[idx[0], idx[1]]
        # equidistant ties may resolve differently; values must still come
        # from covered pixels and mostly agree
        agree = np.isclose(out, ref, atol=1e-6)
        assert agree.mean() > 0.98
        assert np.isin(out.ravel(), ang[covered.astype(bool)].ravel()).all()
