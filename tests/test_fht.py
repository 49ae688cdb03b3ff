"""Fast Hankel transform (FFTLog): scipy.fft.fht/ifht/fhtoffset parity."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.ops import fht as fht_mod

scipy_fft = pytest.importorskip("scipy.fft")
scipy_special = pytest.importorskip("scipy.special")


class TestLogGamma:
    def test_vs_scipy_analytic_continuation(self, rng):
        z = rng.uniform(-3, 5, 500) + 1j * rng.uniform(-50, 50, 500)
        z = z[np.abs(z.real - np.round(z.real)) > 1e-3]  # avoid poles
        got = fht_mod._loggamma(z)
        want = scipy_special.loggamma(z)
        assert np.max(np.abs(got - want) / (1 + np.abs(want))) < 1e-12

    def test_real_axis(self):
        x = np.array([0.5, 1.0, 2.5, 10.0, 171.0])
        got = fht_mod._loggamma(x.astype(complex))
        want = scipy_special.loggamma(x)
        assert np.max(np.abs(got - want) / (1 + np.abs(want))) < 1e-13


class TestCoefficients:
    @pytest.mark.parametrize(
        "n,dln,mu,offset,bias",
        [
            (64, 0.1, 0.0, 0.0, 0.0),
            (100, 0.05, 2.0, 0.3, 0.0),
            (128, 0.02, -0.5, 0.1, 0.2),
            (65, 0.1, 1.0, 0.0, -0.3),
            (64, 0.25, 3.5, -0.2, 0.0),
        ],
    )
    def test_fhtcoeff_vs_scipy(self, n, dln, mu, offset, bias):
        backend = pytest.importorskip("scipy.fft._fftlog_backend")
        got = fht_mod.fhtcoeff(n, dln, mu, offset, bias)
        want = backend.fhtcoeff(n, dln, mu, offset=offset, bias=bias)
        assert np.max(np.abs(got - want) / (1 + np.abs(want))) < 1e-10

    @pytest.mark.parametrize(
        "dln,mu,initial,bias",
        [(0.1, 2.0, 0.5, 0.0), (0.05, 0.0, 0.0, 0.1), (0.2, -0.5, 1.0, -0.2)],
    )
    def test_fhtoffset_vs_scipy(self, dln, mu, initial, bias):
        got = sp.fhtoffset(dln, mu, initial=initial, bias=bias)
        want = scipy_fft.fhtoffset(dln, mu, initial=initial, bias=bias)
        assert abs(got - want) < 1e-10


class TestTransform:
    @pytest.mark.parametrize(
        "n,dln,mu,offset,bias",
        [
            (64, 0.1, 0.0, 0.0, 0.0),
            (128, 0.05, 2.0, 0.3, 0.0),
            (100, 0.02, 0.5, 0.1, 0.2),
            (63, 0.1, 1.0, 0.0, 0.0),
        ],
    )
    def test_fht_ifht_vs_scipy(self, rng, n, dln, mu, offset, bias):
        a = rng.standard_normal((3, n)).astype(np.float32)
        got = np.asarray(sp.fht(a, dln, mu, offset=offset, bias=bias))
        want = scipy_fft.fht(a.astype(np.float64), dln, mu, offset=offset,
                             bias=bias)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5
        gi = np.asarray(sp.ifht(got, dln, mu, offset=offset, bias=bias))
        wi = scipy_fft.ifht(want, dln, mu, offset=offset, bias=bias)
        assert np.max(np.abs(gi - wi)) / np.max(np.abs(wi)) < 2e-4

    def test_roundtrip_low_ringing(self, rng):
        # analytic check: fht then ifht at a low-ringing offset recovers input
        n, dln, mu = 128, 0.05, 1.0
        offset = sp.fhtoffset(dln, mu, initial=0.1)
        r = np.exp((np.arange(n) - (n - 1) / 2) * dln)
        a = (r ** 2 * np.exp(-(r ** 2) / 2)).astype(np.float32)  # smooth decay
        A = sp.fht(a, dln, mu, offset=offset)
        back = np.asarray(sp.ifht(A, dln, mu, offset=offset))
        assert np.max(np.abs(back - a)) / np.max(np.abs(a)) < 1e-3

    def test_jittable(self, rng):
        import jax

        a = rng.standard_normal((2, 64)).astype(np.float32)
        f = jax.jit(lambda v: sp.fht(v, 0.1, 2.0))
        got = np.asarray(f(a))
        want = scipy_fft.fht(a.astype(np.float64), 0.1, 2.0)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_complex_input_rejected(self):
        with pytest.raises(ValueError):
            sp.fht(np.zeros(8, np.complex64), 0.1, 0.0)
        with pytest.raises(ValueError):
            sp.ifht(np.zeros(8, np.complex64), 0.1, 0.0)


class TestFWHT:
    def test_involution_and_parseval(self, rng):
        for n in (8, 64, 128, 256, 1024):
            x = rng.standard_normal((3, n)).astype(np.float32)
            y = np.asarray(sp.fwht(x))
            back = np.asarray(sp.ifwht(y))
            assert np.max(np.abs(back - x)) < 1e-4, n
            # Parseval: ||Hx||² = n·||x||²
            assert abs(np.sum(y * y) / (n * np.sum(x * x)) - 1) < 1e-5

    def test_matches_dense_hadamard(self, rng):
        for n in (16, 256):
            H = np.array([[1.0]])
            while H.shape[0] < n:
                H = np.block([[H, H], [H, -H]])
            x = rng.standard_normal(n).astype(np.float32)
            got = np.asarray(sp.fwht(x))
            want = H @ x
            assert np.max(np.abs(got - want)) < 1e-3, n

    def test_axis_and_errors(self, rng):
        x = rng.standard_normal((8, 5)).astype(np.float32)
        y = np.asarray(sp.fwht(x, axis=0))
        assert y.shape == x.shape
        with pytest.raises(ValueError):
            sp.fwht(np.zeros(12, np.float32))
