"""B-spline prefilters/evaluators + envelope + firwin_2d — scipy oracles.

The recursive prefilters run fp32 on device (associative scan); scipy's
compiled kernels truncate BACKWARD boundary sums at |term| < sqrt(precision)
(ours at |term| < precision — tighter), so edge comparisons are loose by
design while interiors match to fp32.
"""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture(scope="module")
def sig():
    return np.random.default_rng(0).standard_normal(200)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(1).standard_normal((40, 50))


class TestSymIIR:
    def test_symiirorder1(self, sig):
        got = np.asarray(sp.symiirorder1(sig, 2.0, 0.5, 1e-7))
        want = scipy_signal.symiirorder1(sig, 2.0, 0.5, 1e-7)
        assert np.max(np.abs(got - want)) < 1e-4

    def test_symiirorder2(self, sig):
        got = np.asarray(sp.symiirorder2(sig, 0.6, 0.9, 1e-12))
        want = scipy_signal.symiirorder2(sig, 0.6, 0.9, 1e-12)
        assert np.max(np.abs(got - want)) < 1e-4

    def test_batched_matches_loop(self, sig):
        x2 = np.stack([sig, 2.0 * sig])
        got = np.asarray(sp.symiirorder1(x2, 2.0, 0.5, 1e-7))
        one = np.asarray(sp.symiirorder1(sig, 2.0, 0.5, 1e-7))
        assert np.allclose(got[0], one, atol=1e-6)
        assert np.allclose(got[1], 2.0 * one, atol=1e-5)

    def test_validation(self, sig):
        with pytest.raises(ValueError):
            sp.symiirorder1(sig, 1.0, 1.5)  # |z1| >= 1
        with pytest.raises(ValueError):
            sp.symiirorder2(sig, 1.5, 0.9)
        with pytest.raises(ValueError):
            sp.symiirorder1(np.ones(4), 1.0, 0.9, 1e-12)  # horizon > n


class TestSplineCoeffs:
    @pytest.mark.parametrize("lamb", [0.0, 0.5, 5.0])
    def test_cspline1d(self, sig, lamb):
        got = np.asarray(sp.cspline1d(sig, lamb))
        want = scipy_signal.cspline1d(sig, lamb)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5

    def test_qspline1d(self, sig):
        got = np.asarray(sp.qspline1d(sig))
        want = scipy_signal.qspline1d(sig)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5
        with pytest.raises(ValueError):
            sp.qspline1d(sig, lamb=1.0)

    def test_eval_roundtrip(self, sig):
        # evaluating the spline at the knots reproduces the signal
        cj = np.asarray(sp.cspline1d(sig))
        back = np.asarray(sp.cspline1d_eval(cj, np.arange(len(sig))))
        assert np.max(np.abs(back - sig)) < 1e-4
        qj = np.asarray(sp.qspline1d(sig))
        back = np.asarray(sp.qspline1d_eval(qj, np.arange(len(sig))))
        assert np.max(np.abs(back - sig)) < 1e-4

    def test_eval_vs_scipy_with_mirror(self, sig):
        cj = scipy_signal.cspline1d(sig)
        newx = np.random.default_rng(2).uniform(-30, 230, 400)
        got = np.asarray(sp.cspline1d_eval(cj, newx))
        want = scipy_signal.cspline1d_eval(cj, newx)
        assert np.max(np.abs(got - want)) < 1e-4
        qj = scipy_signal.qspline1d(sig)
        got = np.asarray(sp.qspline1d_eval(qj, newx, dx=0.5, x0=-1.0))
        want = scipy_signal.qspline1d_eval(qj, newx, dx=0.5, x0=-1.0)
        assert np.max(np.abs(got - want)) < 1e-4

    def test_gauss_spline(self):
        x = np.linspace(-3, 3, 31)
        assert np.allclose(np.asarray(sp.gauss_spline(x, 3)),
                           scipy_signal.gauss_spline(x, 3), atol=1e-6)


class TestSpline2D:
    @pytest.mark.parametrize("lamb", [0.0, 1.0])
    def test_cspline2d(self, img, lamb):
        got = np.asarray(sp.cspline2d(img, lamb))
        want = scipy_signal.cspline2d(img, lamb)
        # interior: tight; edges carry scipy's sqrt-precision truncation
        e_in = np.max(np.abs(got - want)[4:-4, 4:-4]) / np.max(np.abs(want))
        assert e_in < 2e-4
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-2

    def test_qspline2d(self, img):
        got = np.asarray(sp.qspline2d(img))
        want = scipy_signal.qspline2d(img)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4

    def test_sepfir2d(self, img):
        h1 = np.array([0.25, 0.5, 0.25])
        h2 = np.array([1.0, 2.0, 4.0, 2.0, 1.0]) / 10
        got = np.asarray(sp.sepfir2d(img, h1, h2))
        want = scipy_signal.sepfir2d(img, h1, h2)
        assert np.max(np.abs(got - want)) < 1e-5
        with pytest.raises(ValueError):
            sp.sepfir2d(img, np.ones(4), h2)  # even-length filter

    def test_spline_filter(self, img):
        x32 = img.astype(np.float32)
        got = np.asarray(sp.spline_filter(x32, 5.0))
        want = scipy_signal.spline_filter(x32, 5.0)
        # scipy truncates its boundary sums at |term| < sqrt(1e-3) for fp32,
        # which at lamb=5 poles reaches ~13 samples inward — compare deep
        # interior tightly and the full image loosely
        e_in = np.max(np.abs(got - want)[16:-16, 16:-16]) / np.max(np.abs(want))
        assert e_in < 2e-3
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 6e-2


class TestEnvelope:
    @pytest.mark.parametrize("kwargs", [
        {}, {"bp_in": (5, 60)}, {"squared": True}, {"residual": "all"},
        {"residual": None}, {"n_out": 250}, {"bp_in": (5, 60), "n_out": 125},
    ], ids=lambda k: "-".join(k) or "default")
    def test_real_vs_scipy(self, kwargs):
        if not hasattr(scipy_signal, "envelope"):
            pytest.skip("scipy < 1.16")
        n = 500
        t = np.arange(n) / n
        z = (scipy_signal.windows.gaussian(n, 0.1 * n) * np.cos(2 * np.pi * 30 * t)
             + 0.3 * np.sin(2 * np.pi * 2 * t))
        got = np.asarray(sp.envelope(z.astype(np.float32), **kwargs))
        want = scipy_signal.envelope(z, **kwargs)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) / max(1.0, np.max(np.abs(want))) < 1e-5

    @pytest.mark.parametrize("bp", [(None, None), (-20, 40), (-40, -3)])
    def test_complex_vs_scipy(self, bp):
        if not hasattr(scipy_signal, "envelope"):
            pytest.skip("scipy < 1.16")
        n = 500
        t = np.arange(n) / n
        x = scipy_signal.windows.gaussian(n, 0.1 * n) * np.cos(2 * np.pi * 30 * t)
        z = x + 1j * scipy_signal.hilbert(x).imag
        got = np.asarray(sp.envelope(z.astype(np.complex64), bp_in=bp,
                                     residual="all"))
        want = scipy_signal.envelope(z, bp_in=bp, residual="all")
        assert np.max(np.abs(got - want)) / max(1.0, np.max(np.abs(want))) < 1e-4

    def test_validation(self):
        with pytest.raises(ValueError):
            sp.envelope(np.zeros(16, np.float32), bp_in=(4, 2))
        with pytest.raises(ValueError):
            sp.envelope(np.zeros(16, np.float32), residual="nope")


class TestFirwin2d:
    def test_separable(self):
        got = sp.firwin_2d((15, 21), ("hamming", "hann"), fc=0.3)
        want = scipy_signal.firwin_2d((15, 21), ("hamming", "hann"), fc=0.3)
        assert np.max(np.abs(got - want)) < 1e-12

    def test_circular(self):
        got = sp.firwin_2d((17, 17), "hamming", fc=0.4, circular=True)
        want = scipy_signal.firwin_2d((17, 17), "hamming", fc=0.4, circular=True)
        assert np.max(np.abs(got - want)) < 1e-12

    def test_validation(self):
        with pytest.raises(ValueError):
            sp.firwin_2d((15,), ("hamming", "hann"), fc=0.3)
        with pytest.raises(ValueError):
            sp.firwin_2d((15, 15), "hamming", fc=None, circular=True)
