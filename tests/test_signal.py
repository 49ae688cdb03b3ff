"""DCT, Hilbert transform, periodogram/Welch — oracle comparisons."""

import math

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _dct2_oracle(x, norm=None):
    n = x.shape[-1]
    m = np.arange(n); k = np.arange(n)
    C = 2 * np.cos(np.pi * np.outer(k, 2 * m + 1) / (2 * n))
    y = x @ C.T
    if norm == "ortho":
        s = np.full(n, math.sqrt(1 / (2 * n))); s[0] /= math.sqrt(2)
        y = y * s
    return y


class TestDCT:
    @pytest.mark.parametrize("n", [8, 15, 64, 360])
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_dct2_vs_oracle(self, rng, n, norm):
        x = rng.standard_normal((3, n))
        got = np.asarray(sp.dct(x.astype(np.float32), 2, norm=norm))
        want = _dct2_oracle(x, norm)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_roundtrip(self, rng, norm):
        x = rng.standard_normal(100).astype(np.float32)
        back = np.asarray(sp.idct(sp.dct(x, 2, norm=norm), 2, norm=norm))
        assert np.max(np.abs(back - x)) < 1e-4

    def test_dct3_inverse_pairing(self, rng):
        # scipy pairing: dct(·,3) == idct(·,2) * 2n (unnormalized)
        x = rng.standard_normal(32).astype(np.float32)
        a = np.asarray(sp.dct(x, 3))
        b = np.asarray(sp.idct(x, 2)) * 64
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)

    def test_bad_type(self):
        with pytest.raises(ValueError):
            sp.dct(np.zeros(8, np.float32), type=5)

    def test_ortho_is_orthonormal(self, rng):
        n = 16
        eye = np.eye(n, dtype=np.float32)
        D = np.asarray(sp.dct(eye, 2, norm="ortho"))
        np.testing.assert_allclose(D @ D.T, np.eye(n), atol=1e-5)


def _dct1_mat(n):
    k = np.arange(n)[:, None]; m = np.arange(n)[None, :]
    M = 2 * np.cos(np.pi * k * m / (n - 1))
    M[:, 0] = 1
    M[:, -1] = (-1.0) ** k[:, 0]
    return M


def _dct4_mat(n):
    k = np.arange(n)[:, None]; m = np.arange(n)[None, :]
    return 2 * np.cos(np.pi * (2 * k + 1) * (2 * m + 1) / (4 * n))


def _dst1_mat(n):
    k = np.arange(n)[:, None]; m = np.arange(n)[None, :]
    return 2 * np.sin(np.pi * (k + 1) * (m + 1) / (n + 1))


def _dst4_mat(n):
    k = np.arange(n)[:, None]; m = np.arange(n)[None, :]
    return 2 * np.sin(np.pi * (2 * k + 1) * (2 * m + 1) / (4 * n))


class TestDCTDSTTypes14:
    """DCT/DST types I and IV vs explicit fp64 transform matrices (scipy
    unnormalized conventions)."""

    @pytest.mark.parametrize("n", [2, 8, 15, 64])
    def test_vs_oracle_matrices(self, rng, n):
        x = rng.standard_normal((3, n))
        cases = [
            (lambda a: sp.dct(a, 1), _dct1_mat),
            (lambda a: sp.dct(a, 4), _dct4_mat),
            (lambda a: sp.dst(a, 1), _dst1_mat),
            (lambda a: sp.dst(a, 4), _dst4_mat),
        ]
        for fn, mat in cases:
            got = np.asarray(fn(x.astype(np.float32)))
            want = x @ mat(n).T
            err = np.max(np.abs(got - want)) / np.max(np.abs(want))
            assert err < 3e-5

    @pytest.mark.parametrize("type", [1, 4])
    def test_ortho_orthonormal(self, type):
        n = 16
        eye = np.eye(n, dtype=np.float32)
        for f in (sp.dct, sp.dst):
            D = np.asarray(f(eye, type, norm="ortho"))
            np.testing.assert_allclose(D @ D.T, np.eye(n), atol=2e-5)

    @pytest.mark.parametrize("type", [1, 4])
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_roundtrips(self, rng, type, norm):
        x = rng.standard_normal((2, 31)).astype(np.float32)
        back = np.asarray(sp.idct(sp.dct(x, type, norm=norm), type, norm=norm))
        assert np.max(np.abs(back - x)) < 1e-4
        back = np.asarray(sp.idst(sp.dst(x, type, norm=norm), type, norm=norm))
        assert np.max(np.abs(back - x)) < 1e-4

    def test_dct1_needs_two(self):
        with pytest.raises(ValueError):
            sp.dct(np.zeros(1, np.float32), 1)

    def test_dstn_roundtrip(self, rng):
        img = rng.standard_normal((6, 10)).astype(np.float32)
        back = np.asarray(sp.idstn(sp.dstn(img, 2, norm="ortho"), 2, norm="ortho"))
        assert np.max(np.abs(back - img)) < 1e-4


class TestHilbert:
    def test_cosine_to_analytic(self):
        n = 256
        t = np.arange(n)
        x = np.cos(2 * np.pi * 8 * t / n).astype(np.float32)
        z = np.asarray(sp.hilbert(x))
        # analytic signal of cos = e^{iωt}: imag = sin
        np.testing.assert_allclose(z.real, x, atol=1e-5)
        np.testing.assert_allclose(
            z.imag, np.sin(2 * np.pi * 8 * t / n), atol=1e-4
        )

    def test_envelope(self, rng):
        n = 512
        t = np.arange(n)
        carrier = np.cos(2 * np.pi * 64 * t / n)
        env = 1.0 + 0.5 * np.cos(2 * np.pi * 4 * t / n)
        z = np.asarray(sp.hilbert((env * carrier).astype(np.float32)))
        assert np.max(np.abs(np.abs(z)[32:-32] - env[32:-32])) < 0.05

    def test_complex_input_raises(self):
        with pytest.raises(ValueError):
            sp.hilbert(np.zeros(8, np.complex64))


class TestPSD:
    def test_periodogram_parseval(self, rng):
        # integral of density PSD == variance (boxcar, detrended)
        n, fs = 1024, 10.0
        x = rng.standard_normal(n).astype(np.float32)
        f, p = sp.periodogram(x, fs=fs)
        df = fs / n
        total = float(np.sum(np.asarray(p)) * df)
        var = float(np.var(x))
        assert abs(total - var) / var < 1e-3

    def test_periodogram_peak_at_tone(self):
        n, fs = 1024, 1000.0
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * 125.0 * t).astype(np.float32)
        f, p = sp.periodogram(x, fs=fs, detrend=False)
        assert abs(float(np.asarray(f)[int(np.argmax(np.asarray(p)))]) - 125.0) < 1.0

    def test_welch_peak_and_shape(self, rng):
        n, fs = 4096, 1000.0
        t = np.arange(n) / fs
        x = (np.sin(2 * np.pi * 100 * t) + 0.1 * rng.standard_normal(n)).astype(
            np.float32
        )
        f, p = sp.welch(x, fs=fs, nperseg=256)
        f = np.asarray(f); p = np.asarray(p)
        assert p.shape == (129,)
        assert abs(f[np.argmax(p)] - 100.0) < 4.0

    def test_welch_density_integral(self, rng):
        n, fs = 8192, 1.0
        x = rng.standard_normal(n).astype(np.float32)
        f, p = sp.welch(x, fs=fs, nperseg=512)
        df = fs / 512
        total = float(np.sum(np.asarray(p)) * df)
        assert abs(total - 1.0) < 0.15  # white noise unit variance

    def test_welch_nondividing_length_matches_scipy_convention(self, rng):
        # len=1000, nperseg=256, hop=128: (1000-256) % 128 != 0, so scipy
        # DROPS the partial tail frame and detrends each segment separately.
        # Oracle: hand-written scipy-convention Welch in fp64.
        n, fs, nperseg = 1000, 1.0, 256
        hop = nperseg - nperseg // 2
        x = rng.standard_normal(n).astype(np.float32)
        xd = x.astype(np.float64)
        w = np.asarray(sp.get_window("hann", nperseg), dtype=np.float64)
        n_frames = 1 + (n - nperseg) // hop
        segs = np.stack([xd[i * hop : i * hop + nperseg] for i in range(n_frames)])
        segs = segs - segs.mean(axis=-1, keepdims=True)
        spec = np.fft.rfft(segs * w, axis=-1)
        p = (np.abs(spec) ** 2).mean(axis=0) / (fs * np.sum(w**2))
        p[1:-1] *= 2.0  # one-sided (nperseg even: DC and Nyquist not doubled)
        f, got = sp.welch(x, fs=fs, nperseg=nperseg)
        np.testing.assert_allclose(np.asarray(got), p, rtol=1e-4, atol=1e-7)

    def test_short_signal_caps_nperseg(self, rng):
        # scipy semantics: nperseg longer than the signal is capped to the
        # signal length (one full segment) instead of raising
        x = rng.standard_normal(100).astype(np.float32)
        f, p = sp.welch(x)  # default nperseg=256 > 100
        assert np.asarray(p).shape == (51,)
        f2, pxy = sp.csd(x, x)
        assert np.asarray(pxy).shape == (51,)

    def test_bad_scaling(self):
        with pytest.raises(ValueError):
            sp.periodogram(np.zeros(64, np.float32), scaling="nope")


def _dst2_oracle(x, norm=None):
    n = x.shape[-1]
    m = np.arange(n); k = np.arange(n)
    S = 2 * np.sin(np.pi * np.outer(k + 1, 2 * m + 1) / (2 * n))
    y = x @ S.T
    if norm == "ortho":
        s = np.full(n, math.sqrt(1 / (2 * n))); s[-1] /= math.sqrt(2)
        y = y * s
    return y


class TestDST:
    @pytest.mark.parametrize("n", [8, 15, 64])
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_dst2_vs_oracle(self, rng, n, norm):
        x = rng.standard_normal((2, n))
        got = np.asarray(sp.dst(x.astype(np.float32), 2, norm=norm))
        want = _dst2_oracle(x, norm)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_roundtrip(self, rng, norm):
        x = rng.standard_normal(60).astype(np.float32)
        back = np.asarray(sp.idst(sp.dst(x, 2, norm=norm), 2, norm=norm))
        assert np.max(np.abs(back - x)) < 1e-4

    def test_ortho_orthonormal(self):
        n = 16
        D = np.asarray(sp.dst(np.eye(n, dtype=np.float32), 2, norm="ortho"))
        np.testing.assert_allclose(D @ D.T, np.eye(n), atol=1e-5)


class TestCsdCoherence:
    def test_csd_self_is_welch(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        f1, pxx = sp.welch(x, nperseg=256)
        f2, pxy = sp.csd(x, x, nperseg=256)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(
            np.asarray(pxx), np.real(np.asarray(pxy)), rtol=1e-4, atol=1e-6
        )

    def test_coherence_identical_signals(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        f, c = sp.coherence(x, x, nperseg=256)
        np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-3)

    def test_coherence_independent_low(self, rng):
        x = rng.standard_normal(16384).astype(np.float32)
        y = rng.standard_normal(16384).astype(np.float32)
        f, c = sp.coherence(x, y, nperseg=256)
        assert float(np.mean(np.asarray(c))) < 0.25


class TestWindows:
    def test_kaiser_shape_and_peak(self):
        w = sp.get_window(("kaiser", 8.0), 64)
        assert w.shape == (64,)
        assert abs(float(np.max(w)) - 1.0) < 1e-6
        assert w[0] < 0.01

    @pytest.mark.parametrize("name", ["blackmanharris", "flattop", "bartlett"])
    def test_named_windows(self, name):
        w = sp.get_window(name, 128)
        assert w.shape == (128,)
        assert np.all(np.isfinite(w))

    def test_bad_parameterized(self):
        with pytest.raises(ValueError):
            sp.get_window(("gauss", 1.0), 64)

    @pytest.mark.parametrize(
        "window",
        [("tukey", 0.25), ("tukey", 0.5), ("tukey", 0.0), ("tukey", 1.0),
         ("gaussian", 7.0), ("gaussian", 32.0), ("kaiser", 8.0)],
    )
    @pytest.mark.parametrize("n", [64, 255, 256])
    def test_parameterized_vs_scipy(self, window, n):
        ss = pytest.importorskip("scipy.signal")
        got = sp.get_window(window, n)
        want = ss.get_window(window, n, fftbins=True)
        assert np.max(np.abs(got - want)) < 1e-6


class TestSpectralDiff:
    def test_sine_derivative(self):
        n = 128
        t = np.linspace(0, 2 * np.pi, n, endpoint=False)
        x = np.sin(3 * t).astype(np.float32)
        d = np.asarray(sp.spectral_diff(x))
        np.testing.assert_allclose(d, 3 * np.cos(3 * t), atol=1e-3)

    def test_second_derivative(self):
        n = 64
        t = np.linspace(0, 2 * np.pi, n, endpoint=False)
        x = np.cos(2 * t).astype(np.float32)
        d2 = np.asarray(sp.spectral_diff(x, order=2))
        np.testing.assert_allclose(d2, -4 * np.cos(2 * t), atol=1e-3)

    def test_custom_period(self):
        n, L = 100, 10.0
        t = np.linspace(0, L, n, endpoint=False)
        x = np.sin(2 * np.pi * t / L).astype(np.float32)
        d = np.asarray(sp.spectral_diff(x, period=L))
        np.testing.assert_allclose(d, (2 * np.pi / L) * np.cos(2 * np.pi * t / L), atol=1e-3)

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.spectral_diff(np.zeros(8, np.complex64))
        with pytest.raises(ValueError):
            sp.spectral_diff(np.zeros(8, np.float32), order=0)


class TestDCTN:
    def test_2d_matches_separable_oracle(self, rng):
        x = rng.standard_normal((8, 12))
        got = np.asarray(sp.dctn(x.astype(np.float32), norm="ortho"))
        want = _dct2_oracle(_dct2_oracle(x, "ortho").T, "ortho").T
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_roundtrip(self, rng):
        x = rng.standard_normal((6, 10)).astype(np.float32)
        back = np.asarray(sp.idctn(sp.dctn(x, norm="ortho"), norm="ortho"))
        assert np.max(np.abs(back - x)) < 1e-4

    def test_partial_axes(self, rng):
        x = rng.standard_normal((3, 8, 12)).astype(np.float32)
        got = np.asarray(sp.dctn(x, axes=(-1,), norm="ortho"))
        want = np.asarray(sp.dct(x, 2, axis=-1, norm="ortho"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestPoisson:
    def test_manufactured_solution_2d(self):
        n = 64
        x = np.linspace(0, 2 * np.pi, n, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u_true = np.sin(2 * X) * np.cos(3 * Y)
        f = -(4 + 9) * u_true
        u = np.asarray(sp.poisson_solve(f.astype(np.float32)))
        assert np.max(np.abs(u - u_true)) < 1e-5

    def test_1d_and_periods(self):
        n, L = 48, 3.0
        x = np.linspace(0, L, n, endpoint=False)
        k = 2 * np.pi * 2 / L
        u_true = np.sin(k * x)
        f = -(k ** 2) * u_true
        u = np.asarray(sp.poisson_solve(f.astype(np.float32), period=L))
        assert np.max(np.abs(u - u_true)) < 1e-5

    def test_laplacian_inverse_property_3d(self, rng):
        # laplacian(poisson_solve(f)) == f for mean-zero f
        f = rng.standard_normal((16, 16, 16)).astype(np.float32)
        f -= f.mean()
        u = np.asarray(sp.poisson_solve(f)).astype(np.float64)
        spec = np.fft.fftn(u)
        k = 2 * np.pi * np.fft.fftfreq(16, 1 / 16) / (2 * np.pi)
        k2 = (k**2)[:, None, None] + (k**2)[None, :, None] + (k**2)[None, None, :]
        lap = np.fft.ifftn(-k2 * spec).real
        assert np.max(np.abs(lap - f)) < 1e-4

    def test_rejects_complex(self):
        with pytest.raises(ValueError):
            sp.poisson_solve(np.zeros(8, np.complex64))


class TestResample:
    """Fourier resampling vs scipy.signal.resample (exact algorithm parity:
    spectrum truncation/padding with unpaired-Nyquist unite/split)."""

    scipy = pytest.importorskip("scipy.signal")

    @pytest.mark.parametrize(
        "n_x,num",
        [(100, 63), (100, 171), (128, 64), (128, 256), (63, 128), (63, 31),
         (100, 100), (96, 4)],
    )
    @pytest.mark.parametrize("window", [None, "hann", ("kaiser", 4.0)])
    def test_real_vs_scipy(self, rng, n_x, num, window):
        x = rng.standard_normal((3, n_x)).astype(np.float32)
        got = np.asarray(sp.resample(x, num, window=window))
        want = self.scipy.resample(x.astype(np.float64), num, axis=-1,
                                   window=window)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    @pytest.mark.parametrize("n_x,num", [(100, 64), (64, 100), (50, 50)])
    def test_complex_vs_scipy(self, rng, n_x, num):
        x = (rng.standard_normal((2, n_x))
             + 1j * rng.standard_normal((2, n_x))).astype(np.complex64)
        got = np.asarray(sp.resample(x, num))
        want = self.scipy.resample(x.astype(np.complex128), num, axis=-1)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_freq_domain_and_axis(self, rng):
        X = np.fft.fft(rng.standard_normal((4, 50)))
        got = np.asarray(sp.resample(X.astype(np.complex64), 80, domain="freq"))
        want = self.scipy.resample(X, 80, axis=-1, domain="freq")
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5
        x2 = rng.standard_normal((40, 5)).astype(np.float32)
        wfun = lambda f: (np.abs(f) < 0.25).astype(float)
        got = np.asarray(sp.resample(x2, 25, axis=0, window=wfun))
        want = self.scipy.resample(x2.astype(np.float64), 25, axis=0, window=wfun)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_sine_exact(self):
        # a band-limited sine resamples exactly onto the finer grid
        t1 = np.arange(64) / 64.0
        t2 = np.arange(160) / 160.0
        x = np.sin(2 * np.pi * 5 * t1).astype(np.float32)
        got = np.asarray(sp.resample(x, 160))
        want = np.sin(2 * np.pi * 5 * t2)
        assert np.max(np.abs(got - want)) < 1e-5

    def test_jittable(self, rng):
        import jax
        x = rng.standard_normal((2, 48)).astype(np.float32)
        f = jax.jit(lambda a: sp.resample(a, 32))
        got = np.asarray(f(x))
        want = self.scipy.resample(x.astype(np.float64), 32, axis=-1)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.resample(np.zeros(8, np.float32), 4, domain="nope")
        with pytest.raises(ValueError):
            sp.resample(np.zeros(8, np.float32), 0)
        with pytest.raises(ValueError):
            sp.resample(np.zeros(8, np.float32), 4, window=np.ones(7))


class TestMultitaper:
    def test_matches_fp64_oracle(self, rng):
        from scipy.signal import windows

        n, fs = 1024, 100.0
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * 12.5 * t) + 0.5 * rng.standard_normal(n)
        f, P = sp.multitaper(x.astype(np.float32), fs=fs, nw=4.0)
        f, P = np.asarray(f), np.asarray(P)
        tap, lam = windows.dpss(n, 4.0, 7, return_ratios=True)
        xm = x - x.mean()
        S = np.abs(np.fft.rfft(tap * xm[None, :], axis=-1)) ** 2
        want = ((lam / lam.sum())[:, None] * S).sum(0) / fs
        m = np.full(n // 2 + 1, 2.0)
        m[0] = m[-1] = 1.0
        want *= m
        assert np.abs(P - want).max() / want.max() < 1e-5
        assert abs(f[P.argmax()] - 12.5) < 2 * (f[1] - f[0])

    def test_density_integrates_to_variance(self, rng):
        n, fs = 2048, 50.0
        x = rng.standard_normal(n).astype(np.float32)
        f, P = sp.multitaper(x, fs=fs)
        f, P = np.asarray(f), np.asarray(P)
        total = float((P * (f[1] - f[0])).sum())
        var = float((x - x.mean()).var())
        assert abs(total - var) / var < 0.05

    def test_unity_weighting_batch_jit(self, rng):
        import jax

        x = rng.standard_normal((3, 512)).astype(np.float32)
        f, P = jax.jit(
            lambda v: sp.multitaper(v, fs=10.0, weighting="unity", k=4)
        )(x)
        assert np.asarray(P).shape == (3, 257)
        f1, P1 = sp.multitaper(x[1], fs=10.0, weighting="unity", k=4)
        assert np.abs(np.asarray(P)[1] - np.asarray(P1)).max() < 1e-6

    def test_errors(self, rng):
        x = rng.standard_normal(64).astype(np.float32)
        with pytest.raises(ValueError):
            sp.multitaper(x.astype(np.complex64))
        with pytest.raises(ValueError):
            sp.multitaper(x, weighting="bogus")
        with pytest.raises(ValueError):
            sp.multitaper(x, scaling="spectrum")
        with pytest.raises(ValueError):
            sp.multitaper(np.ones(1, np.float32))


def test_multitaper_nfft_guard(rng):
    x = rng.standard_normal(256).astype(np.float32)
    with pytest.raises(ValueError):
        sp.multitaper(x, nfft=128)
    # zero-padding is allowed
    f, P = sp.multitaper(x, nfft=512)
    assert np.asarray(P).shape == (257,)


class TestCepstrum:
    def test_rceps_echo_detection(self, rng):
        base = rng.standard_normal(1024)
        x = base.copy()
        x[100:] += 0.5 * base[:-100]
        c = np.asarray(sp.rceps(x.astype(np.float32)))
        assert int(np.abs(c[50:512]).argmax()) + 50 == 100

    def test_cceps_impulse_echo_series(self):
        """Complex cepstrum of delta + a*delta_d is the textbook series
        (-1)^(k+1) a^k/k at quefrencies k*d."""
        n = 1024
        x = np.zeros(n, np.float32)
        x[0], x[150] = 1.0, 0.4
        xh, nd = sp.cceps(x)
        c = np.asarray(xh)
        assert abs(c[150] - 0.4) < 1e-5
        assert abs(c[300] + 0.08) < 1e-5
        assert abs(c[450] - 0.4 ** 3 / 3) < 1e-5
        back = np.asarray(sp.icceps(np.asarray(xh), nd))
        assert np.abs(back - x).max() < 1e-5

    def test_cceps_roundtrip_smooth(self):
        n = 1024
        t = np.arange(n)
        pulse = np.exp(-0.5 * ((t - 200) / 12.0) ** 2)
        x = pulse.copy()
        x[150:] += 0.4 * pulse[:-150]
        xh, nd = sp.cceps(x.astype(np.float32))
        back = np.asarray(sp.icceps(np.asarray(xh), nd))
        assert np.abs(back - x).max() / np.abs(x).max() < 1e-4

    def test_minimum_phase_scipy_parity(self):
        from scipy.signal import firwin, minimum_phase as sp_minphase

        h = firwin(31, 0.3)
        for half in (True, False):
            got = np.asarray(sp.minimum_phase(h.astype(np.float32), half=half))
            want = sp_minphase(h, method="homomorphic", half=half)
            assert got.shape == want.shape
            assert np.abs(got - want).max() / np.abs(want).max() < 1e-4

    def test_minimum_phase_energy_front_loaded(self):
        from scipy.signal import firwin

        h = firwin(63, 0.4)
        hm = np.asarray(sp.minimum_phase(h.astype(np.float32), half=False))
        # minimum phase concentrates energy at the front
        e = np.cumsum(hm ** 2) / np.sum(hm ** 2)
        el = np.cumsum(h ** 2) / np.sum(h ** 2)
        assert e[10] > el[10]

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.rceps(np.zeros(8, np.complex64))
        with pytest.raises(ValueError):
            sp.cceps(np.zeros(8, np.complex64))
        with pytest.raises(ValueError):
            sp.minimum_phase(np.ones(2, np.float32))
        with pytest.raises(ValueError):
            sp.minimum_phase(np.ones(16, np.float32), n_fft=8)


def test_cceps_odd_length_matlab_convention(rng):
    """rcunwrap's midpoint is fix((n+1)/2) — odd lengths must match the
    MATLAB-convention fp64 oracle (round-3 review)."""
    for n in (511,):  # 1023 rides the identical rcunwrap branch (lane audit)
        x = np.zeros(n)
        x[2], x[60] = 1.0, 0.5
        x += 0.01 * rng.standard_normal(n)
        xh, _ = sp.cceps(x.astype(np.float32))
        F = np.fft.fft(x)
        ph = np.unwrap(np.angle(F))
        nh = (n + 1) // 2
        nd = round(ph[nh] / np.pi)
        ph = ph - np.pi * np.arange(n) / nh * nd
        want = np.fft.ifft(np.log(np.abs(F)) + 1j * ph).real
        assert np.abs(np.asarray(xh) - want).max() < 1e-5


def test_multitaper_detrend_linear(rng):
    xt = (rng.standard_normal(1024) + 0.05 * np.arange(1024)).astype(np.float32)
    _, Pc = sp.multitaper(xt, detrend="constant")
    _, Pl = sp.multitaper(xt, detrend="linear")
    Pc, Pl = np.asarray(Pc), np.asarray(Pl)
    assert np.abs(Pc - Pl).max() > 0
    # the linear detrend removes the trend's low-frequency leakage
    assert Pl[1] < Pc[1]
    with pytest.raises(ValueError):
        sp.multitaper(xt, detrend="quadratic")


class TestFirwinFreqz:
    def test_firwin_vs_scipy(self):
        import scipy.signal as ss

        cases = [
            dict(numtaps=31, cutoff=0.3),
            dict(numtaps=64, cutoff=0.4, window="blackman"),
            dict(numtaps=41, cutoff=0.25, pass_zero=False),
            dict(numtaps=55, cutoff=[0.2, 0.5], pass_zero=False),
            dict(numtaps=55, cutoff=[0.2, 0.5], pass_zero=True),
            dict(numtaps=33, cutoff=[0.1, 0.3, 0.6], pass_zero="bandstop"),
            dict(numtaps=81, cutoff=0.35, width=0.04),
            dict(numtaps=21, cutoff=0.3, scale=False),
            dict(numtaps=31, cutoff=1500.0, fs=8000.0),
        ]
        for kw in cases:
            ours = sp.firwin(**kw)
            want = ss.firwin(**kw)
            assert np.max(np.abs(ours - want)) < 1e-12, kw

    def test_firwin_errors(self):
        with pytest.raises(ValueError):
            sp.firwin(30, 0.3, pass_zero=False)  # even taps pass Nyquist
        with pytest.raises(ValueError):
            sp.firwin(31, [0.5, 0.2])
        with pytest.raises(ValueError):
            sp.firwin(31, 1.2)
        with pytest.raises(ValueError):
            sp.firwin(31, 0.3, pass_zero="sideways")

    def test_freqz_fir_vs_scipy(self):
        import scipy.signal as ss

        b = sp.firwin(41, 0.3)
        for kw in (dict(), dict(worN=256), dict(whole=True, worN=300),
                   dict(fs=1000.0)):
            w0, h0 = ss.freqz(b, **kw)
            w1, h1 = sp.freqz(b.astype(np.float32), **kw)
            np.testing.assert_allclose(w1, w0, rtol=1e-9)
            assert np.max(np.abs(np.asarray(h1) - h0)) < 2e-4

    def test_freqz_iir_and_array_grid(self):
        import scipy.signal as ss

        b = np.array([0.2, 0.3, 0.2])
        a = np.array([1.0, -0.5, 0.25])
        grid = np.linspace(0.1, 3.0, 37)
        w0, h0 = ss.freqz(b, a, worN=grid)
        w1, h1 = sp.freqz(b.astype(np.float32), a.astype(np.float32),
                          worN=grid)
        np.testing.assert_allclose(w1, w0, rtol=1e-12)
        assert np.max(np.abs(np.asarray(h1) - h0)) < 2e-5
        # coarse-grid fallback (worN smaller than the filter)
        long_b = sp.firwin(129, 0.2)
        w2, h2 = sp.freqz(long_b.astype(np.float32), worN=16)
        w3, h3 = ss.freqz(long_b, worN=16)
        assert np.max(np.abs(np.asarray(h2) - h3)) < 2e-4


class TestHilbert2:
    def test_vs_scipy(self, rng):
        import scipy.signal as ss

        x = rng.standard_normal((24, 30)).astype(np.float64)
        got = np.asarray(sp.hilbert2(x.astype(np.float32)))
        want = ss.hilbert2(x)
        assert np.max(np.abs(got - want)) < 1e-4
        # odd sizes
        x2 = rng.standard_normal((17, 21))
        got2 = np.asarray(sp.hilbert2(x2.astype(np.float32)))
        want2 = ss.hilbert2(x2)
        assert np.max(np.abs(got2 - want2)) < 1e-4

    def test_batched_and_errors(self, rng):
        import scipy.signal as ss

        xb = rng.standard_normal((3, 16, 16)).astype(np.float32)
        z = np.asarray(sp.hilbert2(xb))
        assert z.shape == (3, 16, 16)
        # batched result matches per-image scipy
        want = np.stack([ss.hilbert2(xb[i].astype(np.float64))
                         for i in range(3)])
        assert np.max(np.abs(z - want)) < 1e-4
        with pytest.raises(ValueError):
            sp.hilbert2(np.zeros((4, 4), np.complex64))
        with pytest.raises(ValueError):
            sp.hilbert2(np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            sp.hilbert2(np.zeros((4, 4), np.float32), n=(2, 3, 4))


class TestRemez:
    @pytest.mark.parametrize("kw", [
        dict(numtaps=65, bands=[0, 0.2, 0.25, 0.5], desired=[1, 0]),
        dict(numtaps=64, bands=[0, 0.2, 0.25, 0.5], desired=[1, 0]),
        dict(numtaps=71, bands=[0, 0.1, 0.15, 0.3, 0.35, 0.5],
             desired=[0, 1, 0], weight=[1, 2, 1]),
        dict(numtaps=63, bands=[0.03, 0.47], desired=[1], type="hilbert"),
        dict(numtaps=51, bands=[0.02, 0.45], desired=[1],
             type="differentiator"),
        dict(numtaps=41, bands=[0, 1000, 1500, 4000], desired=[1, 0],
             fs=8000),
    ])
    def test_vs_scipy(self, kw):
        import scipy.signal as ss

        ours = sp.remez(**kw)
        want = ss.remez(**kw)
        assert np.max(np.abs(ours - want)) < 5e-4, kw
        wg = np.linspace(0, np.pi, 2049)
        Ho = np.abs(np.polyval(ours[::-1], np.exp(-1j * wg)))
        Hw = np.abs(np.polyval(want[::-1], np.exp(-1j * wg)))
        assert np.max(np.abs(Ho - Hw)) < 2e-3, kw

    def test_maxiter_returns_sane_iterate(self):
        # regression: the final (a, y) must be re-solved on the FINAL node
        # set — with stale nodes a truncated run returned |H| peaking at 20
        h = sp.remez(65, [0, 0.2, 0.25, 0.5], [1, 0], maxiter=3)
        w = np.linspace(0, np.pi, 2049)
        H = np.abs(np.polyval(h[::-1], np.exp(-1j * w)))
        assert H.max() < 1.5

    def test_equiripple_property(self):
        # passband/stopband ripples are equal in magnitude (alternation)
        h = sp.remez(65, [0, 0.2, 0.25, 0.5], [1, 0])
        wg = np.linspace(0, np.pi, 16385)
        H = np.abs(np.polyval(h[::-1], np.exp(-1j * wg)))
        rp = np.max(np.abs(H[wg <= 0.4 * np.pi] - 1))
        rs = np.max(H[wg >= 0.5 * np.pi])
        assert abs(rp - rs) / rp < 0.02, (rp, rs)

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.remez(2, [0, 0.4], [1])
        with pytest.raises(ValueError):
            sp.remez(31, [0, 0.3, 0.2, 0.5], [1, 0])
        with pytest.raises(ValueError):
            sp.remez(31, [0, 0.2, 0.3, 0.5], [1])
        with pytest.raises(ValueError):
            sp.remez(31, [0, 0.4], [1], type="sideways")


class TestSignalUtilities:
    def test_detrend_vs_scipy(self, rng):
        import scipy.signal as ss

        x = (np.arange(500) * 0.03 + rng.standard_normal(500)).astype(np.float64)
        for kw in (dict(type="constant"), dict(type="linear"),
                   dict(type="linear", bp=[100, 300])):
            got = np.asarray(sp.detrend(x.astype(np.float32), **kw))
            want = ss.detrend(x, **kw)
            assert np.max(np.abs(got - want)) < 1e-3, kw
        xb = rng.standard_normal((3, 64, 5))
        got = np.asarray(sp.detrend(xb.astype(np.float32), axis=1))
        want = ss.detrend(xb, axis=1)
        assert np.max(np.abs(got - want)) < 1e-4
        with pytest.raises(ValueError):
            sp.detrend(x, type="sideways")

    def test_decimate_vs_scipy(self, rng):
        import scipy.signal as ss

        x = rng.standard_normal(1000).astype(np.float64)
        for q in (2, 5):
            got = np.asarray(sp.decimate(x.astype(np.float32), q))
            want = ss.decimate(x, q, ftype="fir", zero_phase=True)
            assert got.shape == want.shape
            assert np.max(np.abs(got - want)) < 1e-4, q
        # round-4: the IIR path rides the associative-scan sosfiltfilt
        got = np.asarray(sp.decimate(x.astype(np.float32), 4, ftype="iir"))
        want = ss.decimate(x, 4, ftype="iir", zero_phase=True)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-3
        with pytest.raises(ValueError):
            sp.decimate(x, 2, ftype="nope")

    def test_savgol_vs_scipy(self, rng):
        import scipy.signal as ss

        x = np.cumsum(rng.standard_normal(300))
        for kw in (dict(window_length=11, polyorder=3),
                   dict(window_length=21, polyorder=4, deriv=1, delta=0.5),
                   dict(window_length=11, polyorder=2, mode="mirror"),
                   dict(window_length=11, polyorder=2, mode="nearest"),
                   dict(window_length=11, polyorder=2, mode="wrap"),
                   dict(window_length=11, polyorder=2, mode="constant",
                        cval=1.5)):
            got = np.asarray(sp.savgol_filter(x.astype(np.float32), **kw))
            want = ss.savgol_filter(x, **kw)
            scale = np.max(np.abs(want)) + 1e-12
            assert np.max(np.abs(got - want)) / scale < 2e-5, kw
        c = sp.savgol_coeffs(9, 3, deriv=2, delta=0.25)
        cr = ss.savgol_coeffs(9, 3, deriv=2, delta=0.25)
        assert np.max(np.abs(c - cr)) < 1e-12
        with pytest.raises(ValueError):
            sp.savgol_filter(x, 10, 3)  # even window with interp

    def test_group_delay_vs_scipy(self):
        import scipy.signal as ss

        b = sp.firwin(31, 0.3)
        w0, g0 = ss.group_delay((b, 1.0), w=256)
        w1, g1 = sp.group_delay((b, 1.0), w=256)
        keep = np.abs(np.polyval(b[::-1], np.exp(-1j * w0))) > 1e-3
        assert np.max(np.abs(np.asarray(g1)[keep] - g0[keep])) < 1e-2
        # IIR case
        bb = np.array([1.0, 0.5]); aa = np.array([1.0, -0.3])
        w0, g0 = ss.group_delay((bb, aa), w=128)
        _, g1 = sp.group_delay((bb, aa), w=128)
        assert np.max(np.abs(np.asarray(g1) - g0)) < 1e-3

    def test_deconvolve_vs_scipy(self, rng):
        import scipy.signal as ss

        d = np.array([1.0, 0.4, -0.2])
        qtrue = rng.standard_normal(17)
        sig = np.convolve(d, qtrue)
        q, r = sp.deconvolve(sig, d)
        q0, r0 = ss.deconvolve(sig, d)
        assert np.max(np.abs(q - q0)) < 1e-10
        assert np.max(np.abs(r - r0)) < 1e-10
        with pytest.raises(ValueError):
            sp.deconvolve(sig, [0.0, 1.0])


class TestTfestimate:
    def test_recovers_fir_response(self, rng):
        # y = h * x (causal FIR) → H1 estimate ≈ DFT of h at the welch bins
        n = 1 << 15
        x = rng.standard_normal(n).astype(np.float32)
        h = np.array([0.5, 1.0, -0.3, 0.2], np.float64)
        y = np.convolve(x.astype(np.float64), h)[:n].astype(np.float32)
        nperseg = 256
        f, H = sp.tfestimate(x, y, nperseg=nperseg)
        H = np.asarray(H)
        want = np.fft.rfft(h, nperseg)
        # welch-averaged estimate: loose statistical tolerance
        assert np.max(np.abs(H - want)) / np.max(np.abs(want)) < 0.05
        assert np.asarray(f).shape == H.shape

    def test_identity_system(self, rng):
        x = rng.standard_normal(8192).astype(np.float32)
        _, H = sp.tfestimate(x, x, nperseg=128)
        np.testing.assert_allclose(np.asarray(H), 1.0, atol=1e-4)


class TestPFB:
    def test_tone_isolation_and_gain(self):
        K, P = 64, 8
        t = np.arange(K * 64)
        k0 = 13
        x = np.cos(2 * np.pi * k0 / K * t).astype(np.float32)
        Y = np.asarray(sp.pfb_analysis(x, K, P))
        assert Y.shape == (64 - P + 1, K)
        # unit cosine at a channel center: |y| = 1/2 at ±k0
        np.testing.assert_allclose(np.abs(Y[:, k0]), 0.5, atol=1e-3)
        pw = (np.abs(Y) ** 2).mean(0)
        others = np.delete(pw, [k0, K - k0])
        # prototype stopband: leakage under -60 dB of the channel power
        assert others.max() < pw[k0] * 1e-6

    def test_flat_inband_response(self):
        # a PFB channel is ~flat across its band (a bare FFT scallops ~4 dB)
        K, P = 32, 12
        t = np.arange(K * 96)
        k0 = 5
        gains = []
        for off in (0.0, 0.25, 0.45):
            x = np.exp(2j * np.pi * (k0 + off) / K * t).astype(np.complex64)
            Y = np.asarray(sp.pfb_analysis(x, K, P))
            gains.append(np.abs(Y[:, k0]).mean())
        assert gains[0] > 0.99
        assert gains[1] / gains[0] > 0.85
        # band edge (off=0.45): response already rolling off but nonzero
        assert 0.2 < gains[2] / gains[0] < 0.9

    def test_custom_prototype_jit_errors(self, rng):
        import jax

        K, P = 16, 4
        h = sp.pfb_prototype(K, P, window="hann")
        x = rng.standard_normal((2, K * 32)).astype(np.float32)
        Y = np.asarray(jax.jit(
            lambda v: sp.pfb_analysis(v, K, h=h)
        )(x))
        assert Y.shape == (2, 32 - P + 1, K)
        f = sp.pfb_frequencies(K, fs=1000.0)
        assert f.shape == (K,) and abs(f[1] - 1000.0 / K) < 1e-9
        with pytest.raises(ValueError):
            sp.pfb_analysis(x, K, h=np.ones(K * 4 + 3))
        with pytest.raises(ValueError):
            sp.pfb_analysis(np.zeros(8, np.float32), K, P)
        with pytest.raises(ValueError):
            sp.pfb_prototype(1, 4)

    def test_synthesis_round_trip(self, rng):
        K, P = 32, 8
        for x in (
            rng.standard_normal(K * 64).astype(np.float32),
            (rng.standard_normal(K * 64)
             + 1j * rng.standard_normal(K * 64)).astype(np.complex64),
        ):
            Y = sp.pfb_analysis(x, K, P, mode="full")
            assert np.asarray(Y).shape == (64 + P - 1, K)
            xr = np.asarray(sp.pfb_synthesis(Y, P))
            assert xr.shape == (x.size,)
            # full-mode frames deconvolve exactly; the branch-Nyquist dip
            # amplifies fp32 round-off ~25x -> 1e-4-class
            err = np.max(np.abs(xr - x))
            assert err < 1e-3, err
            if np.isrealobj(x):
                assert np.max(np.abs(xr.imag)) < 1e-3

    def test_synthesis_round_trip_non_multiple_of_k(self, rng):
        # ADVICE r4 (medium): T % K != 0 used to truncate the tail block,
        # wrapping ~1e-2 error over the WHOLE reconstruction.  full mode
        # now right-pads to a multiple of K; the pad reconstructs as ~0.
        K, P, T = 32, 8, 32 * 20 + 13
        x = (rng.standard_normal(T)
             + 1j * rng.standard_normal(T)).astype(np.complex64)
        Y = sp.pfb_analysis(x, K, P, mode="full")
        Tpad = ((T + K - 1) // K) * K
        assert np.asarray(Y).shape == (Tpad // K + P - 1, K)
        xr = np.asarray(sp.pfb_synthesis(Y, P))
        assert xr.shape == (Tpad,)
        assert np.max(np.abs(xr[:T] - x)) < 1e-3
        assert np.max(np.abs(xr[T:])) < 1e-3

    def test_synthesis_batched_custom_h(self, rng):
        K, P = 16, 6
        h = sp.pfb_prototype(K, P, window="hann")
        x = rng.standard_normal((3, K * 48)).astype(np.float32)
        Y = sp.pfb_analysis(x, K, h=h, mode="full")
        xr = np.asarray(sp.pfb_synthesis(Y, h=h))
        assert np.max(np.abs(xr.real - x)) < 1e-3
        with pytest.raises(ValueError):
            sp.pfb_synthesis(np.zeros(8, np.complex64))
        with pytest.raises(ValueError):
            sp.pfb_analysis(x, K, h=h, mode="same")

    def test_oversampled_matches_critical_on_coincident_frames(self, rng):
        # hop = 3K/4: oversampled frame 4j starts at sample 3jK, i.e.
        # coincides with critically-sampled frame 3j — outputs must agree
        # (the derotation makes channels true baseband)
        K, P = 32, 8
        x = (rng.standard_normal(K * 96)
             + 1j * rng.standard_normal(K * 96)).astype(np.complex64)
        Yc = np.asarray(sp.pfb_analysis(x, K, P))
        Yo = np.asarray(sp.pfb_analysis(x, K, P, hop=3 * K // 4))
        n = min(Yo.shape[0] // 4, Yc.shape[0] // 3)
        np.testing.assert_allclose(
            Yo[4 * np.arange(n)], Yc[3 * np.arange(n)], atol=1e-4
        )
        Yh = np.asarray(sp.pfb_analysis(x, K, P, hop=K // 2))
        n2 = min(Yh[::2].shape[0], Yc.shape[0])
        np.testing.assert_allclose(Yh[::2][:n2], Yc[:n2], atol=1e-4)

    def test_oversampled_tone_is_dc_baseband(self):
        # a channel-center tone must channelize to a CONSTANT sequence at
        # any hop (derotation check) with the same unit gain
        K, P, k0 = 64, 8, 13
        t = np.arange(K * 64)
        x = np.exp(2j * np.pi * k0 / K * t).astype(np.complex64)
        Y = np.asarray(sp.pfb_analysis(x, K, P, hop=3 * K // 4))
        ch = Y[:, k0]
        np.testing.assert_allclose(np.abs(ch), 1.0, atol=2e-3)
        np.testing.assert_allclose(ch, ch[0], atol=2e-3)
        with pytest.raises(ValueError):
            sp.pfb_analysis(x, K, P, hop=0)
