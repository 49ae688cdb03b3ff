"""Auditory-model analysis: ERB ladder, cochleagram, modulation spectrum."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_erb_space_properties():
    f = sp.erb_space(50.0, 8000.0, 32)
    assert f.shape == (32,)
    assert abs(f[0] - 50.0) < 1e-9 and abs(f[-1] - 8000.0) < 1e-6
    assert np.all(np.diff(f) > 0)
    # ERB spacing: high-frequency gaps much wider than low
    assert np.diff(f)[-1] > 10 * np.diff(f)[0]
    with pytest.raises(ValueError):
        sp.erb_space(100.0, 50.0, 8)


def test_gammatonegram_tone_lands_in_right_band(rng):
    fs = 16000.0
    k = np.arange(int(0.5 * fs))
    for tone in (250.0, 1000.0, 4000.0):
        x = np.sin(2 * np.pi * tone * k / fs).astype(np.float32)
        G = np.asarray(sp.gammatonegram(x, fs, n_filters=48))
        _, freqs = sp.gammatone_filterbank(48, fs)
        band = int(np.argmax(G.mean(axis=-1)))
        # peak band center within ~1.2 ERB of the tone
        erb = 24.7 + tone / 9.26449
        assert abs(freqs[band] - tone) < 1.3 * erb, (tone, freqs[band])


def test_gammatonegram_batched_shape(rng):
    fs = 8000.0
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    G = np.asarray(sp.gammatonegram(x, fs, n_filters=24, hop=80))
    assert G.shape == (2, 24, 50)
    assert np.all(G >= 0)


def test_modulation_spectrum_detects_am_rate(rng):
    fs = 8000.0
    k = np.arange(int(2.0 * fs))
    f_mod = 6.0  # syllable-rate AM
    x = ((1.0 + 0.8 * np.sin(2 * np.pi * f_mod * k / fs))
         * np.sin(2 * np.pi * 1000.0 * k / fs)).astype(np.float32)
    S, carriers, mods = sp.modulation_spectrum(x, fs, n_filters=24)
    S = np.asarray(S)
    band = int(np.argmin(np.abs(carriers - 1000.0)))
    row = S[band]
    sel = (mods > 1.0) & (mods < 30.0)
    peak_mod = mods[sel][np.argmax(row[sel])]
    assert abs(peak_mod - f_mod) < 0.6, peak_mod


def test_auditory_review_regressions(rng):
    fs = 8000.0
    k = np.arange(4000)
    # int16 PCM input must not zero the bank (review finding)
    pcm = (3000 * np.sin(2 * np.pi * 500.0 * k / fs)).astype(np.int16)
    G = np.asarray(sp.gammatonegram(pcm, fs, n_filters=8))
    assert G.max() > 0
    # too-short signals are rejected, not silently padded (review finding)
    with pytest.raises(ValueError):
        sp.gammatonegram(np.zeros(50, np.float32), 16000.0, n_filters=4)
