"""Wigner-Ville: chirp IF tracking, time marginal, tone localization,
batch/jit, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_chirp_instantaneous_frequency(rng):
    fs, T = 1000.0, 1024
    t = np.arange(T) / fs
    f0, f1 = 50.0, 200.0
    rate = (f1 - f0) / t[-1]
    sig = np.cos(2 * np.pi * (f0 * t + 0.5 * rate * t * t)).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=129, hop=8))
    errs = []
    for i in range(4, W.shape[0] - 4):
        f_inst = f0 + rate * t[i * 8]
        k = int(np.argmax(W[i][: 129 // 2]))
        errs.append(abs(k * fs / (2 * 129) - f_inst))
    assert np.median(errs) < fs / (2 * 129)  # sub-bin IF tracking


def test_time_marginal_is_instantaneous_power(rng):
    sig = rng.standard_normal(512).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=65, hop=4))
    z = np.asarray(sp.hilbert(sig))
    marg = W.sum(-1) / 65
    want = np.abs(z[::4]) ** 2
    sl = slice(10, -10)
    assert np.abs(marg[sl] - want[sl]).max() / want.max() < 1e-5


def test_tone_concentrates_at_its_bin(rng):
    fs, T = 800.0, 512
    f_tone = 100.0
    sig = np.cos(2 * np.pi * f_tone * np.arange(T) / fs).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=129, hop=16))
    mid = W[W.shape[0] // 2]
    k = int(np.argmax(mid[: 129 // 2]))
    assert abs(k * fs / (2 * 129) - f_tone) < fs / 129


def test_batch_jit(rng):
    import jax

    x = rng.standard_normal((2, 256)).astype(np.float32)
    W = np.asarray(jax.jit(
        lambda v: sp.wigner_ville(v, nperseg=33, hop=8)
    )(x))
    assert W.shape[:1] == (2,)
    single = np.asarray(sp.wigner_ville(x[1], nperseg=33, hop=8))
    scale = max(1.0, float(np.abs(single).max()))
    assert np.abs(W[1] - single).max() / scale < 1e-5


def test_errors(rng):
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(2, np.float32))
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=32)  # even
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=129)  # > T
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=33, hop=0)


class TestSynchrosqueezing:
    def test_two_tone_sharpening(self, rng):
        T = 2048
        t = np.arange(T)
        f1, f2 = 0.05, 0.17
        sig = (np.cos(2 * np.pi * f1 * t)
               + 0.7 * np.cos(2 * np.pi * f2 * t)).astype(np.float32)
        S, freqs = sp.ssq_cwt(sig, n_scales=96, fmin=0.01, fmax=0.4)
        mag = np.abs(np.asarray(S))[:, 200:-200].mean(-1)
        top2 = np.sort(np.argsort(mag)[-2:])
        # recovered frequencies within one log-bin
        assert abs(freqs[top2[0]] - f1) / f1 < 0.06
        assert abs(freqs[top2[1]] - f2) / f2 < 0.06
        # squeezing concentrates nearly all energy on the two ridges
        conc = sum(mag[max(0, k - 1) : k + 2].sum() for k in top2) / mag.sum()
        assert conc > 0.95

    def test_chirp_ridge_tracks(self, rng):
        T = 2048
        t = np.arange(T)
        f0, f1 = 0.03, 0.2
        rate = (f1 - f0) / T
        sig = np.cos(2 * np.pi * (f0 * t + 0.5 * rate * t * t)).astype(
            np.float32
        )
        S, freqs = sp.ssq_cwt(sig, n_scales=96, fmin=0.01, fmax=0.4)
        mag = np.abs(np.asarray(S))
        errs = []
        for n in range(300, T - 300, 100):
            f_inst = f0 + rate * n
            k = int(np.argmax(mag[:, n]))
            errs.append(abs(freqs[k] - f_inst) / f_inst)
        assert np.median(errs) < 0.06, errs

    def test_batch_jit(self, rng):
        import jax

        x = rng.standard_normal((2, 512)).astype(np.float32)
        S, freqs = jax.jit(
            lambda v: sp.ssq_cwt(v, n_scales=32, fmin=0.02, fmax=0.4)
        )(x)
        assert np.asarray(S).shape == (2, 32, 512)
        S1, _ = sp.ssq_cwt(x[1], n_scales=32, fmin=0.02, fmax=0.4)
        a, b = np.asarray(S)[1], np.asarray(S1)
        # Synchrosqueezing scatters each CWT coefficient into the NEAREST
        # frequency bin, so a coefficient whose instantaneous-frequency
        # estimate sits on a bin edge flips bins under fp-level differences
        # between the batched-jit and single-signal executables (XLA CPU
        # reduction order varies with thread count — seen flaking under
        # load).  The frequency-marginal (sum over bins) is invariant to
        # which bin energy lands in; compare that exactly, and the direct
        # diff only loosely (catches real breakage, tolerates bin flips).
        scale = max(1.0, float(np.abs(b).max()))
        assert np.abs(a.sum(axis=0) - b.sum(axis=0)).max() / scale < 1e-5
        assert np.abs(a - b).max() / scale < 0.25

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.ssq_cwt(np.ones(4, np.float32))
        with pytest.raises(ValueError):
            sp.ssq_cwt(np.ones(64, np.float32), fmin=0.4, fmax=0.2)
        with pytest.raises(ValueError):
            sp.ssq_cwt(np.ones(64, np.float32), n_scales=1)


class TestSsqStft:
    def test_two_tone_ridges(self, rng):
        T = 4096
        t = np.arange(T)
        f1, f2 = 0.0503, 0.1717
        sig = (np.cos(2 * np.pi * f1 * t)
               + 0.7 * np.cos(2 * np.pi * f2 * t)).astype(np.float32)
        S, freqs = sp.ssq_stft(sig, nperseg=256)
        mag = np.abs(np.asarray(S))[10:-10].mean(0)
        df = freqs[1]
        for f0 in (f1, f2):
            k = int(round(f0 / df))
            kw = np.argmax(mag[k - 2 : k + 3]) + k - 2
            assert abs(freqs[kw] - f0) < 1.5 * df
            # energy near the ridge dominates a window twice the mainlobe
            near = mag[k - 2 : k + 3].sum()
            wide = mag[max(0, k - 8) : k + 9].sum()
            assert near / wide > 0.8

    def test_batch_jit_errors(self, rng):
        import jax

        x = rng.standard_normal((2, 1024)).astype(np.float32)
        S, freqs = jax.jit(lambda v: sp.ssq_stft(v, nperseg=128))(x)
        assert np.asarray(S).shape[0] == 2
        assert np.asarray(S).shape[-1] == 65
        with pytest.raises(ValueError):
            sp.ssq_stft(np.zeros(64, np.complex64))


class TestInverseSynchrosqueezing:
    def test_issq_cwt_tone_roundtrip(self, rng):
        T = 2048
        t = np.arange(T)
        f0 = 0.043
        x = np.cos(2 * np.pi * f0 * t).astype(np.float32)
        S, _ = sp.ssq_cwt(x, n_scales=128, fmin=1 / 256, fmax=0.5)
        xr = np.asarray(sp.issq_cwt(S, n_scales=128, fmin=1 / 256, fmax=0.5))
        core = slice(128, -128)  # away from Hilbert/CWT edge effects
        err = np.linalg.norm(xr[core] - x[core]) / np.linalg.norm(x[core])
        assert err < 0.05, err

    @pytest.mark.slow  # tone_roundtrip keeps issq_cwt in the default lane;
    # the two-tone variant doubles scales/length for the same inverse path
    def test_issq_cwt_two_tone(self, rng):
        T = 4096
        t = np.arange(T)
        x = (np.cos(2 * np.pi * 0.031 * t)
             + 0.6 * np.sin(2 * np.pi * 0.117 * t)).astype(np.float32)
        S, _ = sp.ssq_cwt(x, n_scales=160, fmin=1 / 512, fmax=0.5)
        xr = np.asarray(sp.issq_cwt(S, n_scales=160, fmin=1 / 512, fmax=0.5))
        core = slice(256, -256)
        err = np.linalg.norm(xr[core] - x[core]) / np.linalg.norm(x[core])
        assert err < 0.06, err

    def test_issq_stft_frame_centers(self, rng):
        T = 4096
        t = np.arange(T)
        x = (np.cos(2 * np.pi * 0.0503 * t)
             + 0.7 * np.cos(2 * np.pi * 0.1717 * t + 0.3)).astype(np.float32)
        nperseg = 256
        S, _ = sp.ssq_stft(x, nperseg=nperseg)
        xr = np.asarray(sp.issq_stft(S, nperseg=nperseg))
        hop = nperseg // 8
        centers = np.arange(xr.shape[-1]) * hop
        keep = (centers > 256) & (centers < T - 256)
        ref = x[centers[keep]]
        err = np.linalg.norm(xr[keep] - ref) / np.linalg.norm(ref)
        assert err < 0.05, err

    def test_issq_errors(self):
        with pytest.raises(ValueError):
            sp.issq_stft(np.zeros((4, 12), np.complex64), nperseg=256)
        with pytest.raises(ValueError):
            sp.issq_cwt(np.zeros((4, 8), np.complex64), fmin=0.4, fmax=0.2)


class TestReassignedSpectrogram:
    def test_impulse_time_collapse(self):
        T = 2048
        nperseg, hop = 256, 32
        t0 = 1024  # multiple of hop
        x = np.zeros(T, np.float32)
        x[t0] = 1.0
        E, _ = sp.reassigned_spectrogram(x, nperseg=nperseg)
        E = np.asarray(E)
        frame_energy = E.sum(-1)
        m0 = t0 // hop
        conc = frame_energy[m0] / max(frame_energy.sum(), 1e-30)
        assert conc > 0.95, conc
        # the plain spectrogram spreads the impulse over ~nperseg/hop frames
        S = np.abs(np.asarray(
            sp.stft(x, nperseg=nperseg, noverlap=nperseg - hop)
        )) ** 2
        plain = S.sum(-1)[m0] / S.sum()
        assert conc > plain + 0.3, (conc, plain)

    def test_chirp_ridge_concentration(self):
        T = 4096
        t = np.arange(T)
        f = 0.05 + (0.20 - 0.05) * t / T  # linear chirp
        phase = 2 * np.pi * np.cumsum(f)
        x = np.cos(phase).astype(np.float32)
        nperseg, hop = 256, 32
        E, freqs = sp.reassigned_spectrogram(x, nperseg=nperseg)
        E = np.asarray(E)
        df = freqs[1]
        m_lo, m_hi = 16, E.shape[0] - 16
        hits = 0
        near = 0.0
        tot = 0.0
        for m in range(m_lo, m_hi):
            f_inst = f[min(m * hop, T - 1)]
            k = int(round(f_inst / df))
            hits += abs(int(np.argmax(E[m])) - k) <= 1
            near += E[m, max(0, k - 1) : k + 2].sum()
            tot += E[m].sum()
        assert hits / (m_hi - m_lo) > 0.9
        assert near / tot > 0.7, near / tot

    def test_energy_conservation_and_batch_jit(self, rng):
        t = np.arange(2048)
        x = np.cos(2 * np.pi * 0.1234 * t).astype(np.float32)
        E, _ = sp.reassigned_spectrogram(x, nperseg=128)
        S = np.abs(np.asarray(
            sp.stft(x, nperseg=128, noverlap=128 - 16)
        )) ** 2
        ratio = np.asarray(E).sum() / S.sum()
        assert 0.8 < ratio <= 1.0 + 1e-6, ratio
        xb = rng.standard_normal((2, 1024)).astype(np.float32)
        import jax
        Eb, _ = jax.jit(lambda v: sp.reassigned_spectrogram(v, nperseg=128))(xb)
        assert np.asarray(Eb).shape == (2, 65, 65)
        with pytest.raises(ValueError):
            sp.reassigned_spectrogram(np.zeros(64, np.complex64))


class TestStockwell:
    def test_roundtrip_exact(self, rng):
        for T in (256, 255):
            x = rng.standard_normal(T).astype(np.float32)
            S, freqs = sp.stockwell(x)
            assert S.shape == (T // 2 + 1, T)
            assert freqs[0] == 0 and abs(freqs[-1] - (T // 2) / T) < 1e-12
            xr = np.asarray(sp.istockwell(S))
            assert np.max(np.abs(xr - x)) < 1e-4

    def test_tone_voice_localization(self):
        T = 512
        t = np.arange(T)
        f0 = 32 / T  # exact bin 32
        x = np.cos(2 * np.pi * f0 * t).astype(np.float32)
        S, freqs = sp.stockwell(x)
        mag = np.abs(np.asarray(S)).mean(-1)
        assert np.argmax(mag) == 32
        # voice amplitude of a unit tone is 1/2 along time
        assert np.max(np.abs(np.abs(np.asarray(S)[32]) - 0.5)) < 1e-3

    def test_event_time_localization(self):
        T = 512
        x = np.zeros(T, np.float32)
        x[300] = 1.0
        S, _ = sp.stockwell(x, fmin=64, fmax=64)
        mag = np.abs(np.asarray(S)[0])
        assert abs(int(np.argmax(mag)) - 300) <= 1
        # higher gamma -> wider time spread (sharper frequency resolution)
        Sg, _ = sp.stockwell(x, fmin=64, fmax=64, gamma=2.0)
        mg = np.abs(np.asarray(Sg)[0])
        width = (mag > mag.max() / 2).sum()
        width_g = (mg > mg.max() / 2).sum()
        assert width_g > width

    def test_batch_and_errors(self, rng):
        import jax

        xb = rng.standard_normal((3, 128)).astype(np.float32)
        S, _ = jax.jit(lambda v: sp.stockwell(v))(xb)
        assert np.asarray(S).shape == (3, 65, 128)
        with pytest.raises(ValueError):
            sp.stockwell(np.zeros(64, np.complex64))
        with pytest.raises(ValueError):
            sp.stockwell(np.zeros(64, np.float32), fmin=40, fmax=20)
        with pytest.raises(ValueError):
            sp.istockwell(np.zeros((4, 128), np.complex64))


class TestAmbiguity:
    def test_tone_lives_on_doppler_zero(self):
        T = 512
        t = np.arange(T)
        x = np.cos(2 * np.pi * 0.11 * t).astype(np.float32)
        A = np.abs(np.asarray(sp.ambiguity(x, max_lag=64)))
        # a stationary tone concentrates on the zero-doppler axis
        dop0 = T // 2  # fftshifted center
        on_axis = A[:, dop0].sum()
        off = A.sum() - on_axis
        assert on_axis > 0.1 * off  # axis is 1 of 512 columns, heavily loaded
        assert np.argmax(A.sum(0)) == dop0

    def test_delay_doppler_peak_of_shifted_pulse(self):
        # the AF of a chirp stays concentrated along a rotated line
        T = 512
        t = np.arange(T)
        rate = 0.2 / T
        x = np.cos(2 * np.pi * (0.05 * t + 0.5 * rate * t * t)).astype(np.float32)
        A = np.abs(np.asarray(sp.ambiguity(x, max_lag=64)))
        # chirp AF: doppler of the ridge scales linearly with lag
        lags = np.arange(-64, 65)
        ridge = np.argmax(A, axis=1) - T // 2
        k = np.polyfit(lags[32:-32], ridge[32:-32], 1)[0]
        # doppler bins per half-lag unit = 2·rate·T
        assert abs(k - 2 * rate * T) < 0.05, k

    def test_errors_and_batch(self, rng):
        xb = rng.standard_normal((2, 256)).astype(np.float32)
        A = np.asarray(sp.ambiguity(xb, max_lag=32))
        assert A.shape == (2, 65, 256)
        with pytest.raises(ValueError):
            sp.ambiguity(np.zeros(2, np.float32))
        with pytest.raises(ValueError):
            sp.ambiguity(np.zeros(64, np.float32), max_lag=40)


class TestSpecAugment:
    def test_masks_and_shapes(self, rng):
        import jax

        mag = np.abs(rng.standard_normal((3, 40, 65))).astype(np.float32) + 0.1
        key = jax.random.PRNGKey(0)
        out = np.asarray(sp.specaugment(mag, key, n_freq_masks=2,
                                        freq_mask_width=10, n_time_masks=1,
                                        time_mask_width=8))
        assert out.shape == mag.shape
        zeroed = (out == 0.0)
        assert zeroed.any() and not zeroed.all()
        # masked cells form full rows/columns per batch element
        for b in range(3):
            cols = np.where((out[b] == 0).all(0))[0]
            rows = np.where((out[b] == 0).all(1))[0]
            assert len(cols) <= 20 and len(rows) <= 8
        # unmasked cells are untouched
        assert np.array_equal(out[~zeroed], mag[~zeroed])
        # jits
        f = jax.jit(lambda s, k: sp.specaugment(s, k, mask_value=-1.0))
        out2 = np.asarray(f(mag, key))
        assert (out2 == -1.0).any()
        with pytest.raises(ValueError):
            sp.specaugment(np.zeros(8, np.float32), key)
