"""Subspace/parametric line-spectra estimators: super-resolution oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _two_tones(rng, n=512, f1=0.102, f2=0.118, snr_noise=0.05):
    # tones 0.016 cycles/sample apart — UNDER the FFT resolution 1/128
    # for the m=26-tap correlation window the estimators actually see
    k = np.arange(n)
    x = (np.cos(2 * np.pi * f1 * k + 0.7)
         + 0.8 * np.cos(2 * np.pi * f2 * k + 2.1)
         + snr_noise * rng.standard_normal(n))
    return x.astype(np.float64)


def test_music_pseudospectrum_peaks(rng):
    x = _two_tones(rng)
    freqs, P = sp.music(x, p=4, m=32, nfreq=4096)
    # the two largest local maxima sit at the tone frequencies
    locmax = np.where((P[1:-1] > P[:-2]) & (P[1:-1] > P[2:]))[0] + 1
    top2 = locmax[np.argsort(P[locmax])[-2:]]
    got = np.sort(freqs[top2])
    np.testing.assert_allclose(got, [0.102, 0.118], atol=2e-3)


def test_root_music_super_resolution(rng):
    x = _two_tones(rng)
    f = sp.root_music(x, p=4, m=32)
    pos = np.sort(f[f > 0])
    np.testing.assert_allclose(pos, [0.102, 0.118], atol=1e-3)


def test_esprit_matches_root_music(rng):
    x = _two_tones(rng)
    f = sp.esprit(x, p=4, m=32)
    pos = np.sort(f[f > 0])
    np.testing.assert_allclose(pos, [0.102, 0.118], atol=1e-3)


def test_complex_exponentials_exact():
    # noiseless complex tones: estimates to near machine precision
    k = np.arange(256)
    x = (np.exp(2j * np.pi * 0.12 * k) + 0.5 * np.exp(2j * np.pi * -0.31 * k))
    f_rm = sp.root_music(x, p=2, m=12)
    np.testing.assert_allclose(np.sort(f_rm), [-0.31, 0.12], atol=1e-6)
    f_es = sp.esprit(x, p=2, m=12)
    np.testing.assert_allclose(np.sort(f_es), [-0.31, 0.12], atol=1e-6)
    f_pi = sp.pisarenko(x, p=2)
    np.testing.assert_allclose(np.sort(f_pi), [-0.31, 0.12], atol=1e-6)


def test_prony_damped_sinusoid():
    k = np.arange(200)
    f0, d0, a0 = 0.08, 0.99, 2.0
    x = a0 * (d0 ** k) * np.cos(2 * np.pi * f0 * k)
    f, damp, amps = sp.prony(x, p=2)
    i = np.argmax(f)  # positive-frequency member of the pair
    assert abs(f[i] - f0) < 1e-8
    assert abs(damp[i] - d0) < 1e-8
    # real cosine splits into two conjugate amplitudes of a0/2
    assert abs(abs(amps[i]) - a0 / 2) < 1e-6


def test_prony_fs_units_and_reconstruction(rng):
    fs = 1000.0
    k = np.arange(300)
    x = np.exp(-k / 150) * np.sin(2 * np.pi * 50.0 * k / fs)
    f, damp, amps = sp.prony(x, p=2, fs=fs)
    assert abs(max(f) - 50.0) < 1e-6
    # the fitted model reconstructs the signal
    z = damp * np.exp(2j * np.pi * f / fs)
    recon = np.real((z[None, :] ** k[:, None]) @ amps)
    assert np.max(np.abs(recon - x)) < 1e-8


def test_corr_matrix_properties(rng):
    x = _two_tones(rng)
    R = sp.corr_matrix(x, 16)
    assert R.shape == (16, 16)
    np.testing.assert_allclose(R, R.conj().T, atol=1e-10)  # Hermitian
    w = np.linalg.eigvalsh(R)
    assert w.min() > -1e-8  # PSD


def test_subspace_validation(rng):
    x = rng.standard_normal(64)
    with pytest.raises(ValueError):
        sp.music(x, p=10, m=8)
    with pytest.raises(ValueError):
        sp.corr_matrix(x, 40)
    with pytest.raises(ValueError):
        sp.prony(x, p=40)
    with pytest.raises(ValueError):
        sp.corr_matrix(np.zeros((2, 32)), 8)


def test_music_complex_input_not_mirrored():
    # review finding: aᵀEn (no conjugate) mirrored the frequency axis
    k = np.arange(256)
    x = (np.exp(2j * np.pi * 0.12 * k) + 0.5 * np.exp(-2j * np.pi * 0.31 * k))
    freqs, P = sp.music(x, p=2, m=12, nfreq=2048)
    locmax = np.where((P[1:-1] > P[:-2]) & (P[1:-1] > P[2:]))[0] + 1
    top2 = locmax[np.argsort(P[locmax])[-2:]]
    got = np.sort(freqs[top2])
    np.testing.assert_allclose(got, [-0.31, 0.12], atol=2e-3)
