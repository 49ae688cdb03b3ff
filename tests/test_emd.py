"""Empirical mode decomposition + Hilbert-Huang transform."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_emd_exact_additivity(rng):
    x = rng.standard_normal(512)
    out = sp.emd(x)
    np.testing.assert_allclose(out.sum(axis=0), x, atol=1e-10)
    assert out.shape[1] == 512 and out.shape[0] >= 2


def test_emd_two_tone_separation():
    k = np.arange(1024)
    fast = np.sin(2 * np.pi * 0.2 * k)
    slow = 0.8 * np.sin(2 * np.pi * 0.02 * k)
    out = sp.emd(fast + slow, max_imf=4)
    # IMF 1 carries the fast tone, some later row the slow tone
    interior = slice(64, -64)  # boundary cycles are EMD's known weak spot

    def corr(a, b):
        a = a[interior] - a[interior].mean()
        b = b[interior] - b[interior].mean()
        return abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)
                                    + 1e-30)

    assert corr(out[0], fast) > 0.95
    assert max(corr(out[i], slow) for i in range(1, out.shape[0])) > 0.9


def test_emd_trend_residue():
    k = np.arange(600)
    trend = 0.01 * k
    x = np.sin(2 * np.pi * 0.1 * k) + trend
    out = sp.emd(x, max_imf=3)
    resid = out[-1]
    # residue tracks the trend: strongly increasing, small oscillation
    assert resid[-50:].mean() > resid[:50].mean() + 3.0


def test_emd_max_imf_and_validation(rng):
    x = rng.standard_normal(256)
    out = sp.emd(x, max_imf=2)
    assert out.shape[0] <= 3  # 2 IMFs + residue
    with pytest.raises(ValueError):
        sp.emd(np.zeros((4, 64)))
    with pytest.raises(ValueError):
        sp.emd(np.zeros(4))
    with pytest.raises(ValueError):
        sp.emd(x, max_imf=0)


def test_eemd_reduces_mode_mixing(rng):
    k = np.arange(512)
    x = np.sin(2 * np.pi * 0.1 * k) + 0.4 * np.sin(2 * np.pi * 0.012 * k)
    out = sp.eemd(x, n_ensembles=8, noise_std=0.1, max_imf=4, seed=1)
    assert out.shape[1] == 512
    # ensemble mean still approximately reconstructs the signal
    err = np.abs(out.sum(axis=0) - x)
    assert err[64:-64].max() < 0.2
    # deterministic under the seed
    out2 = sp.eemd(x, n_ensembles=8, noise_std=0.1, max_imf=4, seed=1)
    np.testing.assert_allclose(out, out2)


def test_hilbert_huang_pure_tone():
    k = np.arange(2048)
    f0 = 0.07
    x = np.sin(2 * np.pi * f0 * k)
    imfs, amp, freq = sp.hilbert_huang(x, max_imf=1, fs=1.0)
    amp = np.asarray(amp)
    freq = np.asarray(freq)
    interior = slice(128, -128)
    assert abs(np.median(freq[0][interior]) - f0) < 2e-3
    assert abs(np.median(amp[0][interior]) - 1.0) < 2e-2


def test_hilbert_huang_chirp_tracks_frequency():
    k = np.arange(4096)
    f_inst = 0.02 + (0.08 - 0.02) * k / len(k)
    phase = 2 * np.pi * np.cumsum(f_inst)
    x = np.cos(phase)
    imfs, amp, freq = sp.hilbert_huang(x, max_imf=1, fs=1.0)
    freq = np.asarray(freq)[0]
    interior = slice(256, -256)
    err = np.abs(freq[interior] - f_inst[interior])
    assert np.median(err) < 2e-3
