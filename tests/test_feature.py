"""Spectral descriptors: construction-based oracles (tones, noise)."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

SR = 22050.0


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def _tone(f0, T=16384):
    t = np.arange(T) / SR
    return np.sin(2 * np.pi * f0 * t).astype(np.float32)


class TestDescriptors:
    def test_centroid_of_tone(self):
        c = np.asarray(sp.spectral_centroid(_tone(1000.0), SR, nperseg=2048))
        assert abs(np.median(c[4:-4]) - 1000.0) < 15.0

    def test_bandwidth_orders_tone_vs_noise(self, rng):
        bt = np.median(np.asarray(
            sp.spectral_bandwidth(_tone(1000.0), SR))[4:-4])
        bn = np.median(np.asarray(sp.spectral_bandwidth(
            rng.standard_normal(16384).astype(np.float32), SR))[4:-4])
        assert bt < 100.0 and bn > 2000.0, (bt, bn)

    def test_rolloff(self, rng):
        r = np.asarray(sp.spectral_rolloff(_tone(500.0), SR))
        assert abs(np.median(r[4:-4]) - 500.0) < 30.0
        rn = np.median(np.asarray(sp.spectral_rolloff(
            rng.standard_normal(16384).astype(np.float32), SR,
            roll_percent=0.85))[4:-4])
        assert abs(rn - 0.85 * SR / 2) / (SR / 2) < 0.05
        with pytest.raises(ValueError):
            sp.spectral_rolloff(_tone(500.0), SR, roll_percent=1.5)

    def test_flatness_extremes(self, rng):
        ft = np.median(np.asarray(sp.spectral_flatness(_tone(880.0)))[4:-4])
        fn = np.median(np.asarray(sp.spectral_flatness(
            rng.standard_normal(16384).astype(np.float32)))[4:-4])
        assert ft < 1e-3 and fn > 0.3, (ft, fn)

    def test_contrast_tone_band_pops(self):
        x = _tone(1600.0)  # inside band 3 of fmin=200 octaves
        C = np.asarray(sp.spectral_contrast(x, SR, nperseg=2048))
        assert C.shape[-1] == 7
        mid = C[C.shape[0] // 2]
        assert np.argmax(mid) == 4  # 1600 Hz lies in [1600, 3200)
        with pytest.raises(ValueError):
            sp.spectral_contrast(x, SR, n_bands=9)

    def test_zcr_of_tone(self):
        # a tone at f0 crosses zero 2·f0 times per second
        z = np.asarray(sp.zero_crossing_rate(_tone(441.0), 2048))
        assert abs(np.median(z[4:-4]) - 2 * 441.0 / SR) < 0.003

    def test_rms_waveform_and_parseval(self, rng):
        x = rng.standard_normal(16384).astype(np.float32)
        r = np.asarray(sp.rms(x, frame_length=1024))
        assert abs(np.median(r[4:-4]) - 1.0) < 0.1
        # spectrogram route agrees with waveform route (boxcar window;
        # interior frames — the two pad edges differently: zero vs reflect)
        S = sp.stft(x, nperseg=1024, noverlap=768, window="boxcar")
        r2 = np.asarray(sp.rms(S=S, frame_length=1024))
        n = min(len(r), len(r2))
        assert np.max(np.abs(r[3 : n - 3] - r2[3 : n - 3])) < 1e-5

    def test_batch_jit(self, rng):
        import jax

        xb = rng.standard_normal((2, 8192)).astype(np.float32)
        c = np.asarray(jax.jit(
            lambda v: sp.spectral_centroid(v, SR, nperseg=1024)
        )(xb))
        assert c.shape[0] == 2
        with pytest.raises(ValueError):
            sp.spectral_centroid(np.zeros(4096, np.complex64), SR)


class TestMIR:
    def test_chroma_of_notes(self):
        # A4=440 -> pitch class A (index 9, C-based); C5~523.25 -> C (0)
        for f0, pc in ((440.0, 9), (523.25, 0), (659.25, 4)):  # A, C, E
            x = np.sin(2 * np.pi * f0 * np.arange(22050) / SR).astype(np.float32)
            C = np.asarray(sp.chroma_stft(x, SR, nperseg=4096))
            prof = C[4:-4].mean(0)
            assert np.argmax(prof) == pc, (f0, np.argmax(prof), prof)

    def test_chroma_octave_invariance(self):
        x1 = np.sin(2 * np.pi * 220.0 * np.arange(22050) / SR).astype(np.float32)
        x2 = np.sin(2 * np.pi * 880.0 * np.arange(22050) / SR).astype(np.float32)
        c1 = np.asarray(sp.chroma_stft(x1, SR, nperseg=4096))[4:-4].mean(0)
        c2 = np.asarray(sp.chroma_stft(x2, SR, nperseg=4096))[4:-4].mean(0)
        assert np.argmax(c1) == np.argmax(c2) == 9

    def test_onset_strength_clicks(self):
        x = np.zeros(44100, np.float32)
        hop = 512
        for k in range(8):
            x[4410 * (k + 1)] = 1.0
        env = np.asarray(sp.onset_strength(x, SR, nperseg=2048, hop=hop))
        # envelope peaks near the click frames
        peaks = np.argsort(env)[-8:]
        click_frames = (4410 * np.arange(1, 9)) / hop
        for p in peaks:
            assert np.min(np.abs(click_frames - p)) <= 2.0

    def test_tempo_of_click_track(self):
        # 120 BPM click track at 22050 Hz: clicks every 0.5 s
        x = np.zeros(22050 * 8, np.float32)
        period = int(0.5 * SR)
        x[::period] = 1.0
        x += 0.01 * np.random.default_rng(0).standard_normal(len(x)).astype(np.float32)
        t = float(np.asarray(sp.tempo(x, SR, nperseg=2048, hop=512)))
        assert abs(t - 120.0) / 120.0 < 0.08, t

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.chroma_stft(np.zeros(4096, np.float32), SR, n_chroma=1)
        with pytest.raises(ValueError):
            sp.tempo(np.zeros(2048, np.float32), SR, min_bpm=500, max_bpm=600)


class TestDelta:
    def test_linear_ramp_slope(self):
        # a linear feature track has constant delta = its slope
        track = (0.25 * np.arange(60))[:, None] * np.ones((1, 4))
        d = np.asarray(sp.delta(track.astype(np.float32), width=9))
        assert np.max(np.abs(d - 0.25)) < 1e-5
        # second order of a quadratic
        q = (0.5 * np.arange(60) ** 2)[:, None] * np.ones((1, 3))
        d2 = np.asarray(sp.delta(q.astype(np.float32), width=9, order=2))
        assert np.max(np.abs(d2 - 1.0)) < 1e-3
        with pytest.raises(ValueError):
            sp.delta(track, width=4)
        with pytest.raises(ValueError):
            sp.delta(track, order=0)


class TestBeatTrack:
    def test_click_track_beats(self):
        sr, hop = 22050.0, 512
        period_s = int(0.5 * SR)  # 120 BPM
        x = np.zeros(22050 * 8, np.float32)
        x[::period_s] = 1.0
        bpm, beats = sp.beat_track(x, SR, nperseg=2048, hop=hop)
        bpm = float(np.asarray(bpm))
        beats = np.asarray(beats)
        assert abs(bpm - 120.0) / 120.0 < 0.08, bpm
        beat_frames = np.where(beats)[0]
        # one beat per click (interior), each within 2 frames of a click
        clicks = np.arange(0, len(x), period_s) / hop
        interior = beat_frames[(beat_frames > 4) & (beat_frames < beats.size - 4)]
        assert len(interior) >= len(clicks) - 4
        for b in interior:
            assert np.min(np.abs(clicks - b)) <= 2.0, b
        # spacing is the beat period
        gaps = np.diff(beat_frames)
        assert abs(np.median(gaps) - period_s / hop) <= 1.0

    def test_jit_and_errors(self):
        import jax

        x = np.zeros(22050 * 4, np.float32)
        x[::11025] = 1.0
        f = jax.jit(lambda v: sp.beat_track(v, SR)[1])
        beats = np.asarray(f(x))
        assert beats.dtype == bool and beats.any()
        with pytest.raises(ValueError):
            sp.beat_track(np.zeros((2, 8192), np.float32), SR)


def test_beat_track_silence_no_phantom_beat():
    bpm, beats = sp.beat_track(np.zeros(88200, np.float32), SR)
    assert not np.asarray(beats).any()


class TestDecompose:
    def test_recovers_two_sources(self, rng):
        F, B, k = 80, 64, 2
        comp = np.zeros((k, B))
        comp[0, 5:15] = 1.0
        comp[1, 35:50] = np.hanning(15)
        act = np.abs(np.stack([np.sin(np.linspace(0, 6, F)) + 1.1,
                               (np.arange(F) % 17 < 3) * 2.0], -1))
        S = (act @ comp).astype(np.float32)
        A, C = sp.decompose(S, n_components=2, n_iter=400)
        rec = np.asarray(A) @ np.asarray(C)
        err = np.linalg.norm(rec - S) / np.linalg.norm(S)
        assert err < 0.03, err
        assert (np.asarray(A) >= 0).all() and (np.asarray(C) >= 0).all()
        with pytest.raises(ValueError):
            sp.decompose(S[None])
        with pytest.raises(ValueError):
            sp.decompose(S, n_components=0)


class TestEffectsHelpers:
    def test_trim_and_split(self):
        sr = 22050.0
        t = np.arange(11025) / sr
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        x = np.concatenate([np.zeros(8000, np.float32), tone,
                            np.zeros(6000, np.float32), tone,
                            np.zeros(9000, np.float32)])
        y, (s, e) = sp.trim(x, top_db=40)
        assert s <= 8000 + 2048 and s > 4000
        assert e >= len(x) - 9000 - 2048
        assert np.array_equal(y, x[s:e])
        iv = sp.split(x, top_db=40)
        assert iv.shape == (2, 2)
        # each interval covers one tone burst
        assert iv[0, 0] < 8000 + 2048 and iv[0, 1] > 8000 + 10000
        # all-zero input is all-silent: empty trim, no split intervals
        y0, span = sp.trim(np.zeros(4096, np.float32), top_db=60)
        assert y0.size == 0 and span == (0, 0)
        assert sp.split(np.zeros(4096, np.float32)).shape == (0, 2)
        # impulse at a known position
        z = np.zeros(32768, np.float32)
        z[20000:21000] = 1.0
        _, (s2, e2) = sp.trim(z, top_db=30)
        assert s2 <= 20000 < 21000 <= e2

    def test_split_never_overlaps(self):
        # short silent gaps must not produce overlapping intervals
        sr = 22050.0
        t = np.arange(8000) / sr
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        for gap in (2560, 3072, 3584, 8000):
            x = np.concatenate([tone, np.zeros(gap, np.float32), tone])
            iv = sp.split(x, top_db=40)
            for a, b in zip(iv[:-1], iv[1:]):
                assert a[1] <= b[0], (gap, iv)
            # concatenating intervals never duplicates samples
            total = sum(e - s for s, e in iv)
            assert total <= len(x)

    def test_mu_law_roundtrip(self, rng):
        x = np.clip(rng.standard_normal(4096) * 0.3, -1, 1).astype(np.float32)
        enc = np.asarray(sp.mu_law_encode(x))
        assert enc.dtype == np.int32 and enc.min() >= 0 and enc.max() <= 255
        dec = np.asarray(sp.mu_law_decode(enc))
        assert np.max(np.abs(dec - x)) < 0.03  # 8-bit companding error
        # companding beats uniform 8-bit for small amplitudes
        small = 0.01 * np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
        dmu = np.max(np.abs(np.asarray(
            sp.mu_law_decode(sp.mu_law_encode(small))) - small))
        duni = 2.0 / 255
        assert dmu < duni / 4
        with pytest.raises(ValueError):
            sp.mu_law_encode(x, 1)


class TestDbConversions:
    def test_roundtrips_and_anchors(self, rng):
        p = np.abs(rng.standard_normal((8, 16))).astype(np.float32) + 0.01
        db = np.asarray(sp.power_to_db(p, top_db=None))
        back = np.asarray(sp.db_to_power(db))
        assert np.max(np.abs(back - p)) / p.max() < 1e-5
        assert abs(float(np.asarray(sp.power_to_db(np.float32(100.0),
                                                   top_db=None))) - 20.0) < 1e-5
        a = np.abs(rng.standard_normal(64)).astype(np.float32) + 0.01
        dba = np.asarray(sp.amplitude_to_db(a, top_db=None))
        backa = np.asarray(sp.db_to_amplitude(dba))
        assert np.max(np.abs(backa - a)) / a.max() < 1e-4

    def test_ref_max_and_topdb(self, rng):
        p = np.abs(rng.standard_normal(128)).astype(np.float32)
        db = np.asarray(sp.power_to_db(p, ref="max", top_db=30.0))
        assert abs(db.max()) < 1e-5  # peak pinned at 0 dB
        assert db.min() >= -30.0 - 1e-5
        with pytest.raises(ValueError):
            sp.power_to_db(p, ref="min")
        with pytest.raises(ValueError):
            sp.power_to_db(p, amin=0.0)
        with pytest.raises(ValueError):
            sp.power_to_db(p, top_db=-3.0)


class TestChromaCqtTonnetzGcc:
    def test_chroma_cqt_notes(self):
        # two notes hit distinct pitch classes through one shared CQT kernel
        # cache entry; 22050 samples ≈ 43 hops is plenty (lane audit)
        for f0, pc in ((130.81, 0), (164.81, 4)):  # C3, E3
            x = np.sin(2 * np.pi * f0 * np.arange(22050) / SR).astype(np.float32)
            C = np.asarray(sp.chroma_cqt(x, SR))
            prof = C[6:-6].mean(0)
            assert np.argmax(prof) == pc, (f0, np.argmax(prof))
        with pytest.raises(ValueError):
            sp.chroma_cqt(np.zeros(22050, np.float32), SR,
                          bins_per_octave=35)

    def test_chroma_cqt_non_c_fmin_rolls_to_base_c(self):
        # librosa cq_to_chroma base_c: class 0 is always C — an E3 tone
        # must land on class 4 whether fmin is C1 or E1 (ADVICE r3)
        f_e3 = 164.81
        x = np.sin(2 * np.pi * f_e3 * np.arange(22050) / SR).astype(np.float32)
        f_e1 = 41.203444614108754
        C = np.asarray(sp.chroma_cqt(x, SR, fmin=f_e1))
        assert np.argmax(C[6:-6].mean(0)) == 4

    def test_power_to_db_complex_uses_magnitude(self):
        z = np.array([3 + 4j, 10 + 0j], np.complex64)  # |z| = 5, 10
        db = np.asarray(sp.power_to_db(z, top_db=None))
        exp = 10.0 * np.log10([5.0, 10.0])
        np.testing.assert_allclose(db, exp, atol=1e-5)

    def test_tonnetz_harte_basis_anchor(self):
        # one-hot C chroma → exactly the Harte/librosa basis column for C:
        # R = [1, 1, 1, 1, 0.5, 0.5] — dims 4-5 (major third) at radius 0.5
        c = np.zeros((1, 12), np.float32)
        c[:, 0] = 1.0
        t = np.asarray(sp.tonnetz(chroma=c))[0]
        np.testing.assert_allclose(t, [0.0, 1.0, 0.0, 1.0, 0.0, 0.5],
                                   atol=1e-6)
        c2 = np.zeros((1, 12), np.float32)
        c2[:, 1] = 1.0
        t2 = np.asarray(sp.tonnetz(chroma=c2))[0]
        r3 = np.sqrt(3.0)
        np.testing.assert_allclose(
            t2, [-0.5, -r3 / 2, -1.0, 0.0, r3 / 4, -0.25], atol=1e-6)

    def test_tonnetz_fifth_geometry(self):
        # C and G (a fifth apart) are adjacent on the circle of fifths:
        # their tonnetz vectors are closer than C and F# (tritone)
        def tz_of(pc):
            c = np.zeros((8, 12), np.float32)
            c[:, pc] = 1.0
            return np.asarray(sp.tonnetz(chroma=c))[0]

        tC, tG, tFs = tz_of(0), tz_of(7), tz_of(6)
        assert np.linalg.norm(tC - tG) < np.linalg.norm(tC - tFs)
        assert np.asarray(sp.tonnetz(chroma=np.ones((4, 12), np.float32))).shape == (4, 6)
        with pytest.raises(ValueError):
            sp.tonnetz(chroma=np.ones((4, 11), np.float32))

    def test_gcc_phat_delay(self, rng):
        n = 4096
        s = rng.standard_normal(n).astype(np.float32)
        for d in (7, -12, 150):
            y = np.roll(s, d)
            lag, cc = sp.gcc_phat(s, y, max_lag=256)
            assert abs(float(np.asarray(lag)) - d) < 0.51, (d, float(np.asarray(lag)))
        # fractional delay via band-limited shift
        spec = np.fft.rfft(s)
        frac = 3.4
        yf = np.fft.irfft(spec * np.exp(-2j * np.pi * np.fft.rfftfreq(n) * frac), n)
        lag, _ = sp.gcc_phat(s, yf.astype(np.float32), max_lag=64)
        assert abs(float(np.asarray(lag)) - frac) < 0.25
        # reverberant robustness: add a strong echo to y; PHAT still wins
        ye = y + 0.8 * np.roll(y, 40)
        lag, _ = sp.gcc_phat(s, ye.astype(np.float32), max_lag=256)
        assert abs(float(np.asarray(lag)) - 150) < 1.0
        with pytest.raises(ValueError):
            sp.gcc_phat(s, s[:100])
        with pytest.raises(ValueError):
            sp.gcc_phat(s, y, max_lag=0)

    def test_gcc_phat_peak_at_endpoint_skips_refinement(self, rng):
        # a true peak AT ±max_lag must return the integer lag, not a
        # parabolic fit around the clipped neighbor (ADVICE r3)
        s = rng.standard_normal(4096).astype(np.float32)
        for d in (16, -16):
            y = np.roll(s, d)
            lag, _ = sp.gcc_phat(s, y, max_lag=16)
            assert float(np.asarray(lag)) == float(d)


class TestLPC:
    """Burg-method linear prediction (librosa.lpc conventions)."""

    @staticmethod
    def _burg_oracle(y, order):
        # fp64 reference implementation (librosa's Burg recursion)
        y = np.asarray(y, np.float64)
        ar = np.zeros(order + 1)
        ar[0] = 1.0
        fwd, bwd = y[1:].copy(), y[:-1].copy()
        den = np.dot(fwd, fwd) + np.dot(bwd, bwd)
        for i in range(order):
            k = -2.0 * np.dot(bwd, fwd) / den
            prev = ar.copy()
            for j in range(1, i + 2):
                ar[j] = prev[j] + k * prev[i + 1 - j]
            fwd_prev = fwd.copy()
            fwd = fwd + k * bwd
            bwd = bwd + k * fwd_prev
            den = (1.0 - k * k) * den - fwd[0] ** 2 - bwd[-1] ** 2
            fwd, bwd = fwd[1:], bwd[:-1]
        return ar

    def test_matches_fp64_oracle(self, rng):
        y = rng.standard_normal(512).astype(np.float32)
        for order in (2, 8, 16):
            got = np.asarray(sp.lpc(y, order))
            want = self._burg_oracle(y, order)
            np.testing.assert_allclose(got, want, atol=2e-4)

    def test_recovers_ar2_process(self, rng):
        # y[n] = 0.75 y[n-1] − 0.5 y[n-2] + e[n]  →  a ≈ [1, −0.75, 0.5]
        n = 16384
        e = rng.standard_normal(n)
        y = np.zeros(n)
        for t in range(2, n):
            y[t] = 0.75 * y[t - 1] - 0.5 * y[t - 2] + e[t]
        a = np.asarray(sp.lpc(y.astype(np.float32), 2))
        np.testing.assert_allclose(a, [1.0, -0.75, 0.5], atol=0.03)

    def test_batched_jit_axis(self, rng):
        import jax

        y = rng.standard_normal((3, 256)).astype(np.float32)
        a = np.asarray(jax.jit(lambda v: sp.lpc(v, 4))(y))
        assert a.shape == (3, 5)
        for b in range(3):
            np.testing.assert_allclose(
                a[b], self._burg_oracle(y[b], 4), atol=2e-4)
        at = np.asarray(sp.lpc(y.T, 4, axis=0))
        np.testing.assert_allclose(at, a, atol=1e-6)

    def test_zero_signal_and_errors(self):
        a = np.asarray(sp.lpc(np.zeros(64, np.float32), 3))
        np.testing.assert_allclose(a, [1.0, 0.0, 0.0, 0.0])
        with pytest.raises(ValueError):
            sp.lpc(np.zeros(64, np.complex64), 2)
        with pytest.raises(ValueError):
            sp.lpc(np.zeros(64, np.float32), 0)
        with pytest.raises(ValueError):
            sp.lpc(np.zeros(4, np.float32), 8)
