"""Mel features: scale round trips, filterbank geometry, fp64 spectrogram
oracle, MFCC shape/energy ordering, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_mel_scale_roundtrip_and_anchors():
    f = np.array([0.0, 440.0, 1000.0, 4000.0, 8000.0])
    for htk in (False, True):
        back = sp.mel_to_hz(sp.hz_to_mel(f, htk=htk), htk=htk)
        assert np.abs(back - f).max() < 1e-8
    # slaney: linear below 1 kHz with slope 3/200
    assert abs(float(sp.hz_to_mel(1000.0)) - 15.0) < 1e-12
    assert abs(float(sp.hz_to_mel(500.0)) - 7.5) < 1e-12
    # htk formula at 700 Hz: 2595*log10(2)
    assert abs(float(sp.hz_to_mel(700.0, htk=True)) - 2595.0 * np.log10(2.0)) < 1e-9


def test_filterbank_geometry():
    sr, n_fft, n_mels = 22050, 2048, 40
    fb = sp.mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all()
    freqs = np.fft.rfftfreq(n_fft, 1 / sr)
    centers = sp.mel_frequencies(n_mels + 2, 0, sr / 2)[1:-1]
    # peaks land within one bin of the band centers
    assert np.abs(freqs[fb.argmax(1)] - centers).max() < freqs[1]
    # slaney equal-area: each row integrates to ~1 over Hz
    areas = fb.sum(1) * freqs[1]
    assert np.abs(areas - 1.0).max() < 0.1
    # norm=None keeps unit peaks (away from the resolution floor)
    fb2 = sp.mel_filterbank(sr, n_fft, n_mels, norm=None)
    assert np.abs(fb2.max(1)[5:] - 1.0).max() < 0.1


def test_melspectrogram_matches_fp64_oracle(rng):
    sr, n_fft, hop = 22050.0, 2048, 512
    x = rng.standard_normal(22050).astype(np.float32)
    got = np.asarray(sp.melspectrogram(x, sr))
    xp = np.pad(x.astype(np.float64), (n_fft // 2, n_fft // 2), mode="reflect")
    t = xp.size
    nfrm = 1 + -(-(t - n_fft) // hop)
    xp = np.pad(xp, (0, n_fft + (nfrm - 1) * hop - t))
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    S = np.stack([
        np.abs(np.fft.rfft(xp[i * hop : i * hop + n_fft] * w)) ** 2
        for i in range(nfrm)
    ])
    want = S @ sp.mel_filterbank(int(sr), n_fft, 128, dtype=np.float64).T
    assert got.shape == want.shape
    assert np.abs(got - want).max() / want.max() < 1e-5


def test_tone_lands_in_matching_band(rng):
    sr = 22050.0
    tone = np.sin(2 * np.pi * 2000 * np.arange(22050) / sr).astype(np.float32)
    M = np.asarray(sp.melspectrogram(tone, sr))
    band = int(M[M.shape[0] // 2].argmax())
    cf = sp.mel_frequencies(130, 0, sr / 2)[1:-1][band]
    assert abs(cf - 2000.0) < 150.0  # within a mel band at 2 kHz


def test_mfcc_shape_jit_batch(rng):
    import jax

    x = rng.standard_normal((2, 11025)).astype(np.float32)
    C = np.asarray(jax.jit(lambda v: sp.mfcc(v, 22050.0))(x))
    assert C.shape[:1] == (2,) and C.shape[-1] == 20
    # c0 carries the loudness: scaling the signal shifts only c0
    C2 = np.asarray(jax.jit(lambda v: sp.mfcc(v, 22050.0))(4.0 * x))
    d = np.abs(C2 - C).mean(axis=(0, 1))
    assert d[0] > 5 * d[1:].max()


def test_errors():
    with pytest.raises(ValueError):
        sp.mel_filterbank(22050, 2048, 0)
    with pytest.raises(ValueError):
        sp.mel_filterbank(22050, 2048, 40, fmin=12000.0)
    with pytest.raises(ValueError):
        sp.mel_filterbank(22050, 2048, 40, norm="l2")
    with pytest.raises(ValueError):
        sp.melspectrogram(np.zeros(100, np.complex64), 22050.0)
    with pytest.raises(ValueError):
        sp.mfcc(np.zeros(4096, np.float32), n_mfcc=0)
    with pytest.raises(ValueError):
        sp.mfcc(np.zeros(4096, np.float32), n_mfcc=200, n_mels=128)


def test_fmax_beyond_nyquist_raises():
    with pytest.raises(ValueError):
        sp.mel_filterbank(22050, 2048, 40, fmax=20000.0)


class TestMelInversion:
    def test_mel_to_stft_recovers_magnitude(self, rng):
        sr, n_fft = 22050.0, 512
        t = np.arange(4096) / sr
        x = (np.sin(2 * np.pi * 880 * t)
             + 0.5 * np.sin(2 * np.pi * 2500 * t)).astype(np.float32)
        S = np.abs(np.asarray(sp.stft(x, nperseg=n_fft,
                                      noverlap=n_fft - n_fft // 4))) ** 2
        M = np.asarray(sp.melspectrogram(x, sr, n_fft=n_fft, n_mels=128))
        Sr = np.asarray(sp.mel_to_stft(M, sr, n_fft=n_fft, n_iter=64)) ** 2
        # spectral peaks land on the right bins with sane magnitudes
        mid = S.shape[0] // 2
        for f0 in (880.0, 2500.0):
            k = int(round(f0 * n_fft / sr))
            krec = k - 3 + int(np.argmax(Sr[mid, k - 3 : k + 4]))
            assert abs(krec - k) <= 1
        # NNLS residual is small in the mel domain
        fb = sp.mel_filterbank(sr, n_fft, 128)
        resid = np.linalg.norm(Sr[mid] @ fb.T - M[mid]) / np.linalg.norm(M[mid])
        assert resid < 0.05, resid

    def test_mel_to_audio_roundtrip_spectrum(self, rng):
        sr, n_fft = 22050.0, 512
        t = np.arange(8192) / sr
        x = np.sin(2 * np.pi * 1200 * t).astype(np.float32)
        M = sp.melspectrogram(x, sr, n_fft=n_fft, n_mels=96)
        y = np.asarray(sp.mel_to_audio(M, sr, n_fft=n_fft, n_iter_gl=16,
                                       length=len(x)))
        assert y.shape == x.shape
        # dominant frequency survives the double inversion
        Y = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        f_rec = np.argmax(Y) * sr / len(y)
        assert abs(f_rec - 1200.0) < 30.0, f_rec

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.mel_to_stft(np.zeros((4, 8), np.complex64))
        with pytest.raises(ValueError):
            sp.mel_to_stft(np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            sp.mel_to_stft(np.zeros((4, 8), np.float32), n_iter=-1)


class TestHPSS:
    def _mixture(self):
        sr = 22050.0
        T = 16384
        t = np.arange(T) / sr
        tone = 0.8 * np.sin(2 * np.pi * 880 * t)
        clicks = np.zeros(T)
        clicks[2000::3000] = 3.0
        return (tone + clicks).astype(np.float32), tone, clicks

    def test_separates_tone_and_clicks(self):
        x, tone, clicks = self._mixture()
        nperseg, hop = 512, 128
        S = sp.stft(x, nperseg=nperseg, noverlap=nperseg - hop)
        H, P = sp.hpss(S, kernel_size=31)
        xh = np.asarray(sp.istft(H, nperseg=nperseg,
                                 noverlap=nperseg - hop, length=len(x)))
        xp = np.asarray(sp.istft(P, nperseg=nperseg,
                                 noverlap=nperseg - hop, length=len(x)))
        sl = slice(1024, -1024)
        # harmonic channel keeps the tone, sheds the clicks
        corr_tone = np.corrcoef(xh[sl], tone[sl])[0, 1]
        assert corr_tone > 0.95, corr_tone
        click_idx = np.where(clicks > 0)[0]
        click_idx = click_idx[(click_idx > 1024) & (click_idx < len(x) - 1024)]
        # percussive channel holds most of the click peaks
        assert np.mean(np.abs(xp[click_idx])) > 3 * np.mean(np.abs(xh[click_idx]))

    def test_masks_partition_energy(self, rng):
        mag = np.abs(rng.standard_normal((40, 65))).astype(np.float32)
        H, P = sp.hpss(mag, kernel_size=11)
        # soft masks at margin 1 sum to 1 -> components sum back to input
        assert np.max(np.abs(np.asarray(H) + np.asarray(P) - mag)) < 1e-5

    def test_hard_mask_and_margin(self, rng):
        mag = np.abs(rng.standard_normal((40, 65))).astype(np.float32)
        H, P = sp.hpss(mag, kernel_size=11, power=np.inf, margin=2.0)
        Hn, Pn = np.asarray(H), np.asarray(P)
        # hard masks are 0/1 on each cell; margins make them disjoint
        assert np.all((Hn == 0) | (Pn == 0))

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.hpss(np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            sp.hpss(np.zeros((8, 8), np.float32), kernel_size=4)
        with pytest.raises(ValueError):
            sp.hpss(np.zeros((8, 8), np.float32), margin=0.5)


class TestYin:
    def test_tone_pitch(self):
        sr = 22050.0
        t = np.arange(22050) / sr
        for f0 in (110.0, 220.0, 441.0, 880.0):
            x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
            f = np.asarray(sp.yin(x, 65.0, 2093.0, sr))
            med = np.median(f[4:-4])
            assert abs(med - f0) / f0 < 0.01, (f0, med)

    def test_harmonic_rich_and_vibrato(self):
        sr = 22050.0
        t = np.arange(33075) / sr
        f0 = 196.0  # G3 with strong harmonics
        x = sum((0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
                for k in range(5)).astype(np.float32)
        f = np.asarray(sp.yin(x, 65.0, 2093.0, sr))
        assert abs(np.median(f[4:-4]) - f0) / f0 < 0.01
        # vibrato: ±3% at 5 Hz tracks frame to frame
        inst = f0 * (1 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
        phase = 2 * np.pi * np.cumsum(inst) / sr
        xv = np.sin(phase).astype(np.float32)
        fv = np.asarray(sp.yin(xv, 65.0, 2093.0, sr))
        hop = 512
        centers = np.arange(len(fv)) * hop
        keep = (centers > 2048) & (centers < len(xv) - 2048)
        err = np.abs(fv[keep] - inst[centers[keep]]) / inst[centers[keep]]
        # the 93 ms frame averages ~half a 5 Hz vibrato cycle, so allow 2%
        assert np.median(err) < 0.02, np.median(err)

    def test_batch_jit_errors(self, rng):
        import jax

        sr = 16000.0
        t = np.arange(8000) / sr
        xb = np.stack([np.sin(2 * np.pi * 150 * t),
                       np.sin(2 * np.pi * 300 * t)]).astype(np.float32)
        f = np.asarray(jax.jit(
            lambda v: sp.yin(v, 80.0, 1000.0, sr)
        )(xb))
        assert f.shape[0] == 2
        assert abs(np.median(f[0]) - 150.0) < 3
        assert abs(np.median(f[1]) - 300.0) < 6
        with pytest.raises(ValueError):
            sp.yin(np.zeros(4096, np.complex64), 80, 400)
        with pytest.raises(ValueError):
            sp.yin(np.zeros(4096, np.float32), 400, 80)
        with pytest.raises(ValueError):
            sp.yin(np.zeros(4096, np.float32), 10.0, 20.0, sr=22050.0,
                   frame_length=64)


class TestPyin:
    def test_tone_with_silence_gaps(self):
        sr = 22050.0
        T = 33075
        t = np.arange(T) / sr
        x = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        x[8000:12000] = 0.0  # silent gap
        f0, voiced, pv = sp.pyin(x, 110.0, 440.0, sr, frame_length=2048)
        f0 = np.asarray(f0); voiced = np.asarray(voiced)
        hop = 512
        centers = np.arange(len(f0)) * hop
        tone_frames = (centers > 2048) & (centers < 6000)
        gap_frames = (centers > 9000) & (centers < 11000)
        assert voiced[tone_frames].mean() > 0.9
        assert voiced[gap_frames].mean() < 0.3
        ft = f0[tone_frames & voiced.astype(bool)]
        assert abs(np.median(ft) - 220.0) / 220.0 < 0.02

    def test_viterbi_tracks_noisy_tone(self):
        # moderate noise: the Beta(2,18) threshold prior keeps the frames
        # voiced (CMND dips ~0.04) and the HMM keeps the track coherent
        sr = 22050.0
        rng = np.random.default_rng(3)
        t = np.arange(44100) / sr
        x = (np.sin(2 * np.pi * 330.0 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        f0, voiced, _ = sp.pyin(x, 110.0, 880.0, sr)
        f0 = np.asarray(f0)
        voiced = np.asarray(voiced)
        mid = slice(8, -8)
        assert voiced[mid].mean() > 0.9
        ok = np.abs(f0[mid] - 330.0) / 330.0 < 0.05
        assert ok.mean() > 0.9, ok.mean()
        # heavy noise flips the model to unvoiced rather than to garbage
        xh = (np.sin(2 * np.pi * 330.0 * t)
              + 0.6 * rng.standard_normal(len(t))).astype(np.float32)
        _, vh, _ = sp.pyin(xh, 110.0, 880.0, sr)
        assert np.asarray(vh).mean() < 0.2

    def test_jit_and_errors(self):
        import jax

        sr = 16000.0
        x = np.sin(2 * np.pi * 200 * np.arange(8000) / sr).astype(np.float32)
        f = jax.jit(lambda v: sp.pyin(v, 100.0, 400.0, sr)[0])
        out = np.asarray(f(x))
        assert abs(np.nanmedian(out) - 200.0) / 200.0 < 0.02
        with pytest.raises(ValueError):
            sp.pyin(x, 100.0, 400.0, sr, switch_prob=0.0)
        with pytest.raises(ValueError):
            sp.pyin(x, 100.0, 400.0, sr, resolution=-1.0)


class TestPcenAWeighting:
    def test_pcen_agc_behavior(self, rng):
        # PCEN flattens loudness: a 100x level change barely moves output
        sr, hop = 22050.0, 512
        quiet = np.abs(rng.standard_normal((60, 32))).astype(np.float32)
        loud = 100.0 * quiet
        pq = np.asarray(sp.pcen(quiet, sr, hop))
        pl = np.asarray(sp.pcen(loud, sr, hop))
        # steady state: outputs within a few percent despite 40 dB input gap
        assert np.abs(pl[20:] - pq[20:]).mean() / pq[20:].mean() < 0.1
        # onset emphasis: a sudden step pops above its steady state
        S = np.ones((80, 8), np.float32) * 0.1
        S[40:] = 10.0
        p = np.asarray(sp.pcen(S, sr, hop))
        assert p[40, 0] > 2.0 * p[70, 0]

    def test_pcen_jit_and_errors(self, rng):
        import jax

        S = np.abs(rng.standard_normal((2, 30, 16))).astype(np.float32)
        out = np.asarray(jax.jit(lambda v: sp.pcen(v))(S))
        assert out.shape == S.shape
        with pytest.raises(ValueError):
            sp.pcen(np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            sp.pcen(S, time_constant=0.0)

    def test_a_weighting_anchors(self):
        # IEC 61672 table anchors: 0 dB at 1 kHz, -19.1 at 100 Hz, +1.2 at 2 kHz
        w = sp.A_weighting([100.0, 1000.0, 2000.0, 10000.0])
        assert abs(w[1]) < 0.02
        assert abs(w[0] - (-19.1)) < 0.2
        assert abs(w[2] - 1.2) < 0.1
        assert abs(w[3] - (-2.5)) < 0.2


def test_pyin_high_pitch_resolution():
    # near fmax integer lags are coarse; the parabolic refinement must
    # beat the raw bin grid (review-8 regression)
    sr = 22050.0
    f_true = 850.0
    x = np.sin(2 * np.pi * f_true * np.arange(22050) / sr).astype(np.float32)
    f0, voiced, _ = sp.pyin(x, 200.0, 880.0, sr)
    f0 = np.asarray(f0)[4:-4]
    assert np.nanmedian(np.abs(f0 - f_true)) / f_true < 0.005


class TestMfccInversion:
    def test_mfcc_to_mel_full_rank_exact(self, rng):
        sr = 22050.0
        x = rng.standard_normal(8192).astype(np.float32)
        # with n_mfcc == n_mels and no dB floor the chain is exact
        M = np.asarray(sp.melspectrogram(x, sr, n_fft=512, n_mels=40))
        C = sp.mfcc(x, sr, n_mfcc=40, n_fft=512, n_mels=40, top_db=None)
        M2 = np.asarray(sp.mfcc_to_mel(C, n_mels=40))
        assert np.max(np.abs(M2 - M)) / M.max() < 1e-4

    def test_lifter_roundtrip_and_audio(self):
        sr = 22050.0
        t = np.arange(8192) / sr
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        C = sp.mfcc(x, sr, n_mfcc=20, n_fft=512, n_mels=64, lifter=22.0)
        Cn = sp.mfcc(x, sr, n_mfcc=20, n_fft=512, n_mels=64)
        # unliftering inside mfcc_to_mel cancels the liftering
        Ma = np.asarray(sp.mfcc_to_mel(C, n_mels=64, lifter=22.0))
        Mb = np.asarray(sp.mfcc_to_mel(Cn, n_mels=64))
        assert np.max(np.abs(Ma - Mb)) / Mb.max() < 1e-4
        y = np.asarray(sp.mfcc_to_audio(Cn, sr, n_fft=512, n_mels=64,
                                        n_iter_gl=8, length=len(x)))
        Y = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        f_rec = np.argmax(Y) * sr / len(y)
        assert abs(f_rec - 1000.0) < 60.0, f_rec

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.mfcc_to_mel(np.zeros((4, 50), np.float32), n_mels=40)
        with pytest.raises(ValueError):
            sp.mfcc(np.zeros(4096, np.float32), lifter=-1.0)


def test_mfcc_to_mel_lifter2_finite():
    # review-10 regression: lifter=2 zeroes a lifter entry; inversion must
    # stay finite and round-trip the forward transform
    sr = 22050.0
    x = np.sin(2 * np.pi * 700 * np.arange(8192) / sr).astype(np.float32)
    C = sp.mfcc(x, sr, n_mfcc=20, n_fft=512, n_mels=40, lifter=2.0,
                top_db=None)
    M = np.asarray(sp.mfcc_to_mel(C, n_mels=40, lifter=2.0))
    assert np.isfinite(M).all()
