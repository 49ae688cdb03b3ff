"""Fourier-domain ndimage filters vs the scipy.ndimage oracle."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cases(rng):
    a1 = rng.standard_normal(90).astype(np.float64)
    a2 = rng.standard_normal((24, 36)).astype(np.float64)
    a3 = rng.standard_normal((12, 10, 16)).astype(np.float64)
    return a1, a2, a3


class TestFourierFilters:
    @pytest.mark.parametrize("name,param", [
        ("fourier_gaussian", 2.5),
        ("fourier_uniform", 5.0),
        ("fourier_ellipsoid", 6.0),
    ])
    def test_complex_fft_layout_vs_scipy(self, rng, name, param):
        ours = getattr(sp, name)
        ref = getattr(scipy_ndimage, name)
        for a in _cases(rng):
            A = np.fft.fftn(a)
            got = np.asarray(ours(A.astype(np.complex64), param))
            want = ref(A, param)
            scale = np.max(np.abs(want)) + 1e-30
            assert np.max(np.abs(got - want)) / scale < 5e-6, (name, a.shape)

    @pytest.mark.parametrize("name,param", [
        ("fourier_gaussian", [1.5, 3.0]),
        ("fourier_uniform", [4.0, 7.0]),
        ("fourier_ellipsoid", [5.0, 8.0]),
    ])
    def test_real_fft_layout_and_per_axis(self, rng, name, param):
        ours = getattr(sp, name)
        ref = getattr(scipy_ndimage, name)
        a = rng.standard_normal((20, 30)).astype(np.float64)
        A = np.fft.rfftn(a)  # real axis is the LAST one
        got = np.asarray(ours(A.astype(np.complex64), param, n=30, axis=-1))
        want = ref(A, param, n=30, axis=-1)
        scale = np.max(np.abs(want)) + 1e-30
        assert np.max(np.abs(got - want)) / scale < 5e-6

    def test_roundtrip_smooths(self, rng):
        # low-pass behavior end-to-end through the library's own ffts
        a = rng.standard_normal((32, 32)).astype(np.float32)
        A = sp.fft2(a.astype(np.complex64))
        sm = np.asarray(sp.ifft2(sp.fourier_gaussian(A, 3.0))).real
        # variance collapses under heavy smoothing
        assert sm.var() < 0.1 * a.var()

    def test_errors(self, rng):
        with pytest.raises(ValueError):
            sp.fourier_gaussian(np.zeros((4, 4), np.complex64), [1, 2, 3])
        with pytest.raises(ValueError):
            sp.fourier_ellipsoid(np.zeros((2, 2, 2, 2), np.complex64), 3.0)
        with pytest.raises(ValueError):
            # wrong bin count for the declared real length
            sp.fourier_uniform(np.zeros((8, 8), np.complex64), 3.0, n=20)


class TestWiener:
    def test_vs_scipy(self, rng):
        import scipy.signal as ss

        x1 = rng.standard_normal(200)
        x2 = rng.standard_normal((24, 30))
        for x, size in ((x1, 5), (x2, 3), (x2, (3, 5))):
            got = np.asarray(sp.wiener(x.astype(np.float32), size))
            want = ss.wiener(x, size)
            assert np.max(np.abs(got - want)) < 1e-4, size
        # explicit noise power
        got = np.asarray(sp.wiener(x2.astype(np.float32), 3, noise=0.5))
        want = ss.wiener(x2, 3, noise=0.5)
        assert np.max(np.abs(got - want)) < 1e-4
        # review-9 regression: large offset + long axis (fp32 cumsum
        # cancellation) must stay accurate
        xl = (50.0 + rng.standard_normal(100_000)).astype(np.float64)
        got = np.asarray(sp.wiener(xl.astype(np.float32), 7))
        want = ss.wiener(xl, 7)
        assert np.max(np.abs(got - want)) < 5e-3, np.max(np.abs(got - want))
        with pytest.raises(ValueError):
            sp.wiener(x2, 4)
        with pytest.raises(ValueError):
            sp.wiener(x2, (3, 3, 3))
