"""Direct parity against scipy for every API that claims scipy semantics.

These are convention tests, not accuracy tests: the numerical cores are
already oracle-tested against fp64 numpy; what scipy pins down is the exact
frequency grids, scalings, slicing, and window conventions — the class of
silent mismatch a hand-written oracle can replicate without noticing (the
round-2 zoom_fft endpoint bug was exactly that).
"""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

scipy_fft = pytest.importorskip("scipy.fft")
scipy_signal = pytest.importorskip("scipy.signal")


def _rel(got, want):
    got = np.asarray(got, np.float64) if np.asarray(got).dtype.kind == "f" else np.asarray(got)
    want = np.asarray(want)
    return np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-30)


class TestDctDstParity:
    @pytest.mark.parametrize("type", [1, 2, 3, 4])
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_dct(self, rng, type, norm):
        x = rng.standard_normal((3, 32))
        got = sp.dct(x.astype(np.float32), type, norm=norm)
        want = scipy_fft.dct(x, type=type, norm=norm, axis=-1)
        assert _rel(got, want) < 3e-5

    @pytest.mark.parametrize("type", [1, 2, 3, 4])
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_dst(self, rng, type, norm):
        x = rng.standard_normal((3, 32))
        got = sp.dst(x.astype(np.float32), type, norm=norm)
        want = scipy_fft.dst(x, type=type, norm=norm, axis=-1)
        assert _rel(got, want) < 3e-5

    @pytest.mark.parametrize("type", [1, 2, 3, 4])
    def test_idct_idst(self, rng, type):
        x = rng.standard_normal((2, 24))
        got = sp.idct(x.astype(np.float32), type)
        want = scipy_fft.idct(x, type=type, axis=-1)
        assert _rel(got, want) < 3e-5
        got = sp.idst(x.astype(np.float32), type)
        want = scipy_fft.idst(x, type=type, axis=-1)
        assert _rel(got, want) < 3e-5

    def test_dctn_dstn(self, rng):
        x = rng.standard_normal((8, 12))
        assert _rel(sp.dctn(x.astype(np.float32), 2, norm="ortho"),
                    scipy_fft.dctn(x, type=2, norm="ortho")) < 3e-5
        assert _rel(sp.dstn(x.astype(np.float32), 2, norm="ortho"),
                    scipy_fft.dstn(x, type=2, norm="ortho")) < 3e-5


class TestSpectralParity:
    @pytest.mark.parametrize("nlen", [1000, 1024])
    @pytest.mark.parametrize("window", ["hann", "hamming", "boxcar"])
    def test_welch(self, rng, nlen, window):
        x = rng.standard_normal(nlen)
        f, p = sp.welch(x.astype(np.float32), fs=5.0, window=window, nperseg=256)
        fw, pw = scipy_signal.welch(x, fs=5.0, window=window, nperseg=256)
        np.testing.assert_allclose(np.asarray(f), fw)
        assert _rel(p, pw) < 1e-4

    def test_welch_scaling_spectrum(self, rng):
        x = rng.standard_normal(2048)
        f, p = sp.welch(x.astype(np.float32), nperseg=256, scaling="spectrum")
        _, pw = scipy_signal.welch(x, nperseg=256, scaling="spectrum")
        assert _rel(p, pw) < 1e-4

    def test_csd_and_coherence(self, rng):
        x = rng.standard_normal(3000)
        y = 0.5 * x + rng.standard_normal(3000)
        _, pxy = sp.csd(x.astype(np.float32), y.astype(np.float32), nperseg=256)
        _, pxyw = scipy_signal.csd(x, y, nperseg=256)
        assert _rel(np.asarray(pxy), pxyw) < 1e-4
        _, c = sp.coherence(x.astype(np.float32), y.astype(np.float32), nperseg=256)
        _, cw = scipy_signal.coherence(x, y, nperseg=256)
        assert np.max(np.abs(np.asarray(c) - cw)) < 1e-3

    def test_periodogram(self, rng):
        x = rng.standard_normal(1024)
        f, p = sp.periodogram(x.astype(np.float32), fs=2.0, window="hann")
        fw, pw = scipy_signal.periodogram(x, fs=2.0, window="hann")
        np.testing.assert_allclose(np.asarray(f), fw)
        assert _rel(p, pw) < 1e-4

    def test_hilbert(self, rng):
        x = rng.standard_normal(500)
        got = sp.hilbert(x.astype(np.float32))
        want = scipy_signal.hilbert(x)
        assert np.max(np.abs(np.asarray(got) - want)) / np.max(np.abs(want)) < 1e-5

    @pytest.mark.parametrize(
        "window", ["hann", "hamming", "blackman", "blackmanharris", "bartlett",
                   "flattop", "boxcar", ("kaiser", 8.0)]
    )
    def test_get_window(self, window):
        got = sp.get_window(window, 64, np.float64)
        want = scipy_signal.get_window(window, 64, fftbins=True)
        assert np.max(np.abs(got - want)) < 1e-7


class TestConvolveParity:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_fftconvolve(self, rng, mode):
        a = rng.standard_normal(200)
        b = rng.standard_normal(31)
        got = sp.fft_convolve(a.astype(np.float32), b.astype(np.float32), mode=mode)
        want = scipy_signal.fftconvolve(a, b, mode=mode)
        assert np.asarray(got).shape == want.shape
        assert _rel(got, want) < 1e-4

    def test_oaconvolve(self, rng):
        from mixed_radix_fast_fourier_transform_tpu.ops.convolve import fft_oaconvolve

        a = rng.standard_normal(5000)
        b = rng.standard_normal(63)
        got = fft_oaconvolve(a.astype(np.float32), b.astype(np.float32), mode="full")
        want = scipy_signal.oaconvolve(a, b, mode="full")
        assert np.asarray(got).shape == want.shape
        assert _rel(got, want) < 1e-4

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_fftconvolve2d(self, rng, mode):
        from mixed_radix_fast_fourier_transform_tpu.ops.convolve import fft_convolve2

        a = rng.standard_normal((24, 32))
        b = rng.standard_normal((5, 7))
        got = fft_convolve2(a.astype(np.float32), b.astype(np.float32), mode=mode)
        want = scipy_signal.fftconvolve(a, b, mode=mode)
        assert np.asarray(got).shape == want.shape
        assert _rel(got, want) < 1e-4

    def test_correlate(self, rng):
        from mixed_radix_fast_fourier_transform_tpu.ops.convolve import fft_correlate

        a = rng.standard_normal(100)
        b = rng.standard_normal(17)
        got = fft_correlate(a.astype(np.float32), b.astype(np.float32), mode="full")
        want = scipy_signal.correlate(a, b, mode="full", method="fft")
        assert np.asarray(got).shape == want.shape
        assert _rel(got, want) < 1e-4


class TestCztParity:
    def test_czt_spiral(self, rng):
        x = rng.standard_normal(50) + 1j * rng.standard_normal(50)
        w = 0.995 * np.exp(-2j * np.pi / 61)
        a = 1.01 * np.exp(0.2j)
        got = sp.czt(x.astype(np.complex64), m=40, w=w, a=a)
        want = scipy_signal.czt(x, m=40, w=w, a=a)
        assert _rel(np.asarray(got), want) < 5e-5

    def test_zoom_fft(self, rng):
        x = rng.standard_normal(256)
        got = sp.zoom_fft(x.astype(np.float32), [0.1, 0.3], m=33, fs=2.0)
        want = scipy_signal.zoom_fft(x, [0.1, 0.3], m=33, fs=2.0)
        assert _rel(np.asarray(got), want) < 2e-5


class TestStftParity:
    def test_stft_matches_scipy_up_to_window_scale(self, rng):
        """Our stft is the unscaled rfft of windowed frames (librosa-style);
        scipy.signal.stft divides by win.sum().  With center=False our
        framing (zero-pad partial tail) equals scipy's padded=True,
        boundary=None — so ours == scipy.T * win.sum() exactly."""
        x = rng.standard_normal(1000).astype(np.float32)
        nperseg, noverlap = 256, 128
        ours = np.asarray(sp.stft(x, nperseg=nperseg, noverlap=noverlap, center=False))
        _, _, Z = scipy_signal.stft(
            x.astype(np.float64), nperseg=nperseg, noverlap=noverlap,
            boundary=None, padded=True, window="hann",
        )
        w = scipy_signal.get_window("hann", nperseg)
        want = Z.T * w.sum()
        assert ours.shape == want.shape
        assert np.max(np.abs(ours - want)) / np.max(np.abs(want)) < 1e-5

    def test_istft_roundtrip_matches_scipy_reconstruction(self, rng):
        x = rng.standard_normal(2048).astype(np.float32)
        spec = sp.stft(x, nperseg=256, center=True)
        back = np.asarray(sp.istft(np.asarray(spec), nperseg=256, center=True,
                                   length=2048))
        assert np.max(np.abs(back - x)) < 1e-4


class TestUpfirdnResamplePolyParity:
    @pytest.mark.parametrize(
        "up,down,n,F",
        [(1, 1, 37, 9), (3, 2, 50, 21), (2, 3, 64, 17), (7, 5, 41, 30),
         (1, 4, 100, 41), (5, 1, 33, 12), (4, 6, 55, 16)],
    )
    def test_upfirdn(self, rng, up, down, n, F):
        x = rng.standard_normal(n)
        h = rng.standard_normal(F)
        want = scipy_signal.upfirdn(h, x, up, down)
        got = np.asarray(sp.upfirdn(h, x.astype(np.float32), up, down))
        assert got.shape == want.shape
        assert _rel(got, want) < 1e-5

    def test_upfirdn_complex_and_cval(self, rng):
        h = scipy_signal.firwin(31, 0.4)
        xc = rng.standard_normal(60) + 1j * rng.standard_normal(60)
        want = scipy_signal.upfirdn(h, xc, 2, 3)
        got = np.asarray(sp.upfirdn(h, xc.astype(np.complex64), 2, 3))
        assert _rel(got, want) < 1e-5
        x = rng.standard_normal(50)
        want = scipy_signal.upfirdn(h, x, 3, 2, mode="constant", cval=1.5)
        got = np.asarray(
            sp.upfirdn(h, x.astype(np.float32), 3, 2, cval=1.5)
        )
        assert _rel(got, want) < 1e-5

    @pytest.mark.parametrize(
        "up,down,n",
        [(2, 1, 64), (1, 2, 64), (3, 7, 100), (7, 3, 101), (160, 147, 200),
         (5, 5, 30)],
    )
    def test_resample_poly(self, rng, up, down, n):
        x = rng.standard_normal(n)
        want = scipy_signal.resample_poly(x, up, down)
        got = np.asarray(sp.resample_poly(x.astype(np.float32), up, down))
        assert got.shape == want.shape
        assert _rel(got, want) < 1e-5

    @pytest.mark.parametrize("padtype", ["mean", "median", "minimum", "maximum"])
    def test_resample_poly_padtypes(self, rng, padtype):
        x = rng.standard_normal(80) + 5.0
        want = scipy_signal.resample_poly(x, 3, 2, padtype=padtype)
        got = np.asarray(
            sp.resample_poly(x.astype(np.float32), 3, 2, padtype=padtype)
        )
        assert _rel(got, want) < 1e-5

    def test_resample_poly_cval_window_axis(self, rng):
        x = rng.standard_normal(80) + 5.0
        want = scipy_signal.resample_poly(x, 2, 3, padtype="constant", cval=2.5)
        got = np.asarray(
            sp.resample_poly(x.astype(np.float32), 2, 3, cval=2.5)
        )
        assert _rel(got, want) < 1e-5
        h = scipy_signal.firwin(31, 0.4)
        want = scipy_signal.resample_poly(x, 3, 2, window=h)
        got = np.asarray(sp.resample_poly(x.astype(np.float32), 3, 2, window=h))
        assert _rel(got, want) < 1e-5
        xb = rng.standard_normal((3, 50))
        want = scipy_signal.resample_poly(xb, 5, 4, axis=1)
        got = np.asarray(sp.resample_poly(xb.astype(np.float32), 5, 4, axis=1))
        assert _rel(got, want) < 1e-5

    def test_error_paths(self):
        with pytest.raises(ValueError):
            sp.upfirdn(np.ones(3), np.ones(8, np.float32), 0, 1)
        with pytest.raises(ValueError):
            sp.upfirdn(np.ones((2, 2)), np.ones(8, np.float32))
        with pytest.raises(ValueError):
            sp.upfirdn(np.ones(3), np.ones(8, np.float32), mode="wrap")
        with pytest.raises(ValueError):
            sp.resample_poly(np.ones(8, np.float32), 2, 3, padtype="line")
        with pytest.raises(ValueError):
            sp.resample_poly(np.ones(8, np.float32), 2, 3, padtype="mean",
                             cval=1.0)


class TestLombscargleParity:
    @pytest.fixture()
    def data(self, rng):
        t = np.sort(rng.uniform(0, 10, 200))
        y = np.sin(2.3 * t) + 0.5 * np.cos(7.1 * t) + 0.1 * rng.standard_normal(200)
        freqs = np.linspace(0.5, 20, 64)
        return t, y, freqs

    def test_power_and_normalize(self, data):
        t, y, freqs = data
        for kw in ({}, {"normalize": True}, {"floating_mean": True}):
            want = scipy_signal.lombscargle(t, y, freqs, **kw)
            got = sp.lombscargle(
                t.astype(np.float32), y.astype(np.float32),
                freqs.astype(np.float32), **kw,
            )
            assert _rel(got, want) < 1e-4

    def test_weights_amplitude(self, data, rng):
        t, y, freqs = data
        w = rng.uniform(0.1, 2.0, t.size)
        want = scipy_signal.lombscargle(t, y, freqs, weights=w,
                                        floating_mean=True)
        got = sp.lombscargle(
            t.astype(np.float32), y.astype(np.float32),
            freqs.astype(np.float32), weights=w.astype(np.float32),
            floating_mean=True,
        )
        assert _rel(got, want) < 1e-4
        want = scipy_signal.lombscargle(t, y, freqs, normalize="amplitude")
        got = np.asarray(sp.lombscargle(
            t.astype(np.float32), y.astype(np.float32),
            freqs.astype(np.float32), normalize="amplitude",
        ))
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4

    def test_batched_and_peak(self, data):
        t, y, freqs = data
        yb = np.stack([y, 2 * y]).astype(np.float32)
        got = np.asarray(sp.lombscargle(
            t.astype(np.float32), yb, freqs.astype(np.float32)
        ))
        assert got.shape == (2, 64)
        want = scipy_signal.lombscargle(t, y, freqs)
        assert _rel(got[0], want) < 1e-4
        # dominant frequency recovered
        assert abs(freqs[got[0].argmax()] - 2.3) < freqs[1] - freqs[0]

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.lombscargle(np.zeros((2, 2)), np.zeros(4), np.ones(3))
        with pytest.raises(ValueError):
            sp.lombscargle(np.zeros(4), np.zeros(5), np.ones(3))
        with pytest.raises(ValueError):
            sp.lombscargle(np.zeros(4), np.zeros(4), np.ones(3),
                           normalize="bogus")
        with pytest.raises(ValueError):
            sp.lombscargle(np.zeros(4), np.zeros(4), np.ones(3),
                           weights=np.ones(5))


class TestDpssParity:
    @pytest.mark.parametrize("M,NW,K", [(64, 3.0, 5), (128, 4.0, 7),
                                        (255, 2.5, 4)])
    def test_tapers_and_ratios(self, M, NW, K):
        scipy_windows = pytest.importorskip("scipy.signal.windows")
        got, gr = sp.dpss(M, NW, K, return_ratios=True, dtype=np.float64)
        want, wr = scipy_windows.dpss(M, NW, K, return_ratios=True)
        assert np.abs(got - want).max() < 1e-10
        assert np.abs(gr - wr).max() < 1e-10

    def test_default_kmax_and_errors(self):
        t = sp.dpss(64, 3.0)
        assert t.shape == (5, 64)  # 2*NW - 1
        with pytest.raises(ValueError):
            sp.dpss(1, 0.5)
        with pytest.raises(ValueError):
            sp.dpss(64, 40.0)
        with pytest.raises(ValueError):
            sp.dpss(64, 3.0, 0)


class TestWelchOptionsParity:
    @pytest.mark.parametrize(
        "kw",
        [{"average": "median"}, {"detrend": "linear"}, {"detrend": False},
         {"average": "median", "detrend": "linear"}],
    )
    def test_welch_average_detrend(self, rng, kw):
        x = rng.standard_normal(4096) + 0.002 * np.arange(4096)
        fw, Pw = scipy_signal.welch(x, fs=10.0, nperseg=256, **kw)
        fg, Pg = sp.welch(x.astype(np.float32), fs=10.0, nperseg=256, **kw)
        assert _rel(np.asarray(Pg), Pw) < 1e-4

    def test_csd_detrend_linear(self, rng):
        x = rng.standard_normal(2048) + 0.01 * np.arange(2048)
        y = np.roll(x, 5) + 0.1 * rng.standard_normal(2048)
        fw, Pw = scipy_signal.csd(x, y, fs=4.0, nperseg=256, detrend="linear")
        fg, Pg = sp.csd(x.astype(np.float32), y.astype(np.float32), fs=4.0,
                        nperseg=256, detrend="linear")
        assert np.abs(np.asarray(Pg) - Pw).max() / np.abs(Pw).max() < 1e-4

    def test_welch_errors(self, rng):
        x = rng.standard_normal(512).astype(np.float32)
        with pytest.raises(ValueError):
            sp.welch(x, average="bogus")
        with pytest.raises(ValueError):
            sp.welch(x, detrend="quadratic")


class TestPeriodogramDetrendParity:
    @pytest.mark.parametrize("detrend", ["constant", "linear", False])
    def test_modes(self, rng, detrend):
        x = rng.standard_normal(1024) + 0.01 * np.arange(1024)
        fw, Pw = scipy_signal.periodogram(x, fs=8.0, detrend=detrend)
        fg, Pg = sp.periodogram(x.astype(np.float32), fs=8.0, detrend=detrend)
        assert _rel(np.asarray(Pg), Pw) < 1e-4

    def test_bool_alias(self, rng):
        x = rng.standard_normal(512)
        _, a = sp.periodogram(x.astype(np.float32), detrend=True)
        _, b = sp.periodogram(x.astype(np.float32), detrend="constant")
        assert np.abs(np.asarray(a) - np.asarray(b)).max() == 0.0
