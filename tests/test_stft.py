"""STFT / iSTFT / spectrogram: round trips and scipy-convention checks."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.ops.stft import (
    get_window,
    istft,
    spectrogram,
    stft,
)


class TestWindow:
    def test_hann_endpoints(self):
        w = get_window("hann", 8)
        assert w[0] == pytest.approx(0.0)
        assert np.max(w) <= 1.0

    def test_explicit_array(self):
        w = get_window(np.ones(16), 16)
        assert w.shape == (16,)

    def test_bad_window(self):
        with pytest.raises(ValueError):
            get_window("gauss", 8)
        with pytest.raises(ValueError):
            get_window(np.ones(4), 8)


class TestStft:
    def test_shape(self, rng):
        x = rng.standard_normal(1024).astype(np.float32)
        s = stft(x, nperseg=128, noverlap=64)
        assert s.shape[-1] == 65
        assert s.ndim == 2

    def test_batched(self, rng):
        x = rng.standard_normal((3, 1024)).astype(np.float32)
        s = stft(x, nperseg=128)
        assert s.shape[0] == 3

    def test_pure_tone_peak(self):
        # a bin-centered tone concentrates in that bin
        n, nperseg = 2048, 256
        freq_bin = 16
        t = np.arange(n)
        x = np.cos(2 * np.pi * freq_bin * t / nperseg).astype(np.float32)
        s = np.asarray(spectrogram(x, nperseg=nperseg, noverlap=0, window="boxcar"))
        mid = s[s.shape[0] // 2]
        assert np.argmax(mid) == freq_bin

    def test_roundtrip(self, rng):
        x = rng.standard_normal(2000).astype(np.float32)
        s = stft(x, nperseg=256, noverlap=192)
        y = np.asarray(istft(s, nperseg=256, noverlap=192, length=2000))
        assert np.max(np.abs(y - x)) < 1e-4

    def test_roundtrip_hamming_batched(self, rng):
        x = rng.standard_normal((2, 1500)).astype(np.float32)
        s = stft(x, nperseg=128, noverlap=96, window="hamming")
        y = np.asarray(istft(s, nperseg=128, noverlap=96, window="hamming", length=1500))
        assert np.max(np.abs(y - x)) < 1e-4

    def test_bad_overlap(self, rng):
        with pytest.raises(ValueError):
            stft(np.zeros(512, np.float32), nperseg=128, noverlap=128)

    def test_short_signal_raises(self):
        with pytest.raises(ValueError):
            stft(np.zeros(16, np.float32), nperseg=128, center=False)


class TestSpectrogram:
    def test_power_one_is_magnitude(self, rng):
        x = rng.standard_normal(512).astype(np.float32)
        s1 = np.asarray(spectrogram(x, nperseg=128, power=1.0))
        s2 = np.asarray(spectrogram(x, nperseg=128, power=2.0))
        assert np.allclose(s1 ** 2, s2, rtol=1e-4, atol=1e-5)


class TestGriffinLim:
    def test_spectral_convergence_improves(self, rng):
        n = 4096
        t = np.arange(n)
        x = (np.sin(2 * np.pi * 0.01 * t)
             + 0.5 * np.sin(2 * np.pi * 0.037 * t)).astype(np.float32)
        S = np.abs(np.asarray(sp.stft(x, nperseg=256)))

        def sc(n_iter):
            y = np.asarray(sp.griffinlim(S, n_iter=n_iter, nperseg=256,
                                         length=n))
            Sy = np.abs(np.asarray(sp.stft(y, nperseg=256)))
            return np.linalg.norm(Sy - S) / np.linalg.norm(S)

        c4, c48 = sc(4), sc(48)
        assert c48 < c4 < 0.5
        assert c48 < 0.15

    def test_jit_and_batch(self, rng):
        import jax

        x = rng.standard_normal((2, 2048)).astype(np.float32)
        S = np.abs(np.asarray(sp.stft(x, nperseg=128)))
        y = np.asarray(jax.jit(
            lambda m: sp.griffinlim(m, n_iter=8, nperseg=128, length=2048)
        )(S))
        assert y.shape == (2, 2048)
        assert np.isfinite(y).all()

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.griffinlim(np.zeros((4, 100), np.float32), nperseg=256)
        with pytest.raises(ValueError):
            sp.griffinlim(np.zeros((4, 129), np.complex64), nperseg=256)
        with pytest.raises(ValueError):
            sp.griffinlim(np.zeros((4, 129), np.float32), nperseg=256,
                          n_iter=0)
        with pytest.raises(ValueError):
            sp.griffinlim(np.zeros((4, 129), np.float32), nperseg=256,
                          momentum=1.5)


class TestGriffinLimValidation:
    def test_degenerate_frames_and_lengths(self, rng):
        with pytest.raises(ValueError):
            sp.griffinlim(np.ones((1, 129), np.float32), nperseg=256)
        S = np.abs(np.asarray(sp.stft(
            rng.standard_normal(4096).astype(np.float32), nperseg=256
        )))
        with pytest.raises(ValueError):  # too few frames for this length
            sp.griffinlim(S, nperseg=256, length=100)
        with pytest.raises(ValueError):  # beyond what istft can produce
            sp.griffinlim(S, nperseg=256, length=99999)


class TestWindowSet:
    """Full scipy.signal window-family parity, both conventions."""

    NAMES = ["triang", "parzen", "bohman", "cosine", "barthann", "lanczos",
             "nuttall", ("exponential", None, 13.0), ("chebwin", 100.0),
             ("kaiser", 8.0), ("tukey", 0.4), ("gaussian", 11.0),
             "hann", "hamming", "blackman", "blackmanharris", "flattop",
             "bartlett", "boxcar"]

    @pytest.mark.parametrize("m", [64, 65])
    @pytest.mark.parametrize("sym", [False, True])
    def test_vs_scipy(self, m, sym):
        import scipy.signal as ss

        for nm in self.NAMES:
            got = sp.get_window(nm, m, np.float64, sym=sym)
            want = ss.get_window(nm, m, fftbins=not sym)
            assert np.max(np.abs(got - want)) < 1e-10, (nm, m, sym)

    def test_exponential_short_form_and_errors(self):
        import scipy.signal as ss

        g = sp.get_window(("exponential", 13.0), 64, np.float64)
        w = ss.get_window(("exponential", None, 13.0), 64)
        assert np.max(np.abs(g - w)) < 1e-12
        with pytest.raises(ValueError):
            sp.get_window(("exponential", 3.0, 13.0), 64)  # custom center
        with pytest.raises(ValueError):
            sp.get_window("sideways", 64)
        with pytest.raises(ValueError):
            sp.get_window(("sideways", 1.0), 64)

    def test_windows_flow_through_stft(self, rng):
        x = rng.standard_normal(1024).astype(np.float32)
        for nm in ("nuttall", ("chebwin", 80.0), "parzen"):
            S = sp.stft(x, nperseg=128, window=nm)
            y = np.asarray(sp.istft(S, nperseg=128, window=nm, length=1024))
            assert np.max(np.abs(y - x)) < 1e-4, nm


class TestPhaseVocoder:
    def test_identity_rate(self, rng):
        sr = 22050.0
        t = np.arange(16384) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(sp.time_stretch(x, 1.0, nperseg=1024))
        assert y.shape == x.shape
        # rate-1 stretch preserves the signal up to vocoder phase noise
        corr = np.corrcoef(y[2048:-2048], x[2048:-2048])[0, 1]
        assert corr > 0.99, corr

    @pytest.mark.parametrize(
        "rate", [pytest.param(0.5, marks=pytest.mark.slow), 2.0]
    )  # both rates ride the same vocoder; one per lane (budget audit)
    def test_stretch_preserves_pitch(self, rate):
        sr = 22050.0
        t = np.arange(32768) / sr
        f0 = 440.0
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(sp.time_stretch(x, rate, nperseg=1024))
        assert y.shape[-1] == int(round(len(x) / rate))
        Y = np.abs(np.fft.rfft(y[2048:-2048] * np.hanning(len(y) - 4096)))
        f_rec = np.argmax(Y) * sr / (len(y) - 4096)
        assert abs(f_rec - f0) < 5.0, f_rec

    def test_pitch_shift_octave(self):
        sr = 22050.0
        t = np.arange(32768) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(sp.pitch_shift(x, sr, 12.0, nperseg=1024))
        assert y.shape == x.shape
        core = y[4096:-4096] * np.hanning(len(y) - 8192)
        f_rec = np.argmax(np.abs(np.fft.rfft(core))) * sr / (len(y) - 8192)
        assert abs(f_rec - 880.0) < 10.0, f_rec

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.phase_vocoder(np.zeros((4, 5), np.float32), 2.0)
        with pytest.raises(ValueError):
            sp.time_stretch(np.zeros(4096, np.float32), 0.0)
        with pytest.raises(ValueError):
            sp.pitch_shift(np.zeros(4096, np.float32), 22050.0, 1.0,
                           bins_per_octave=0)
