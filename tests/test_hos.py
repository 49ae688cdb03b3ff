"""Higher-order spectra: quadratic-phase-coupling detection oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _qpc_signal(rng, n, f1, f2, coupled: bool, snr=0.1):
    """Frames of three tones at f1, f2, f1+f2; coupled = phases satisfy
    φ3 = φ1 + φ2 per frame (the bispectrum's raison d'être)."""
    k = np.arange(n)
    x = np.zeros(n)
    seg = 256
    for s in range(0, n - seg + 1, seg):
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        p3 = p1 + p2 if coupled else rng.uniform(0, 2 * np.pi)
        kk = k[s:s + seg]
        x[s:s + seg] = (np.cos(2 * np.pi * f1 * kk + p1)
                        + np.cos(2 * np.pi * f2 * kk + p2)
                        + np.cos(2 * np.pi * (f1 + f2) * kk + p3))
    return (x + snr * rng.standard_normal(n)).astype(np.float32)


def test_bicoherence_detects_coupling(rng):
    f1, f2 = 0.15, 0.0625  # land on bins of nperseg=128: 19.2?? use exact
    f1, f2 = 24 / 128, 8 / 128
    n = 256 * 64
    coupled = _qpc_signal(rng, n, f1, f2, True)
    uncoupled = _qpc_signal(rng, n, f1, f2, False)
    b2c, freqs = sp.bicoherence(coupled, nperseg=128, return_freqs=True)
    b2u = sp.bicoherence(uncoupled, nperseg=128)
    i1, i2 = 24, 8
    assert float(np.asarray(b2c)[i1, i2]) > 0.8
    assert float(np.asarray(b2u)[i1, i2]) < 0.3
    assert np.isclose(freqs[i1], f1)


def test_bicoherence_bounds_and_domain(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    b2 = np.asarray(sp.bicoherence(x, nperseg=64))
    F = 64 // 2 + 1
    assert b2.shape == (F, F)
    assert b2.min() >= 0.0 and b2.max() <= 1.0 + 1e-6
    # outside the principal domain everything is exactly zero
    f1, f2 = np.meshgrid(np.arange(F), np.arange(F), indexing="ij")
    outside = (f2 > f1) | (f1 + f2 > F - 1)
    assert np.all(b2[outside] == 0.0)


def test_bispectrum_phase_of_coupling(rng):
    # coupled tones with φ3 = φ1 + φ2 give a REAL positive bispectrum peak
    f1, f2 = 20 / 128, 12 / 128
    x = _qpc_signal(rng, 256 * 48, f1, f2, True, snr=0.05)
    B = np.asarray(sp.bispectrum(x, nperseg=128))
    peak = B[20, 12]
    assert abs(np.angle(peak)) < 0.2
    # the peak dominates the rest of the principal domain
    mag = np.abs(B)
    mag_peak = mag[20, 12]
    mag[18:23, 10:15] = 0
    assert mag_peak > 5 * mag.max()


def test_bispectrum_gaussian_is_small(rng):
    # Gaussian noise has (asymptotically) zero bispectrum
    x = rng.standard_normal(256 * 64).astype(np.float32)
    tone = _qpc_signal(rng, 256 * 64, 16 / 128, 8 / 128, True, snr=0.0)
    Bn = np.abs(np.asarray(sp.bispectrum(x, nperseg=128)))
    Bt = np.abs(np.asarray(sp.bispectrum(tone, nperseg=128)))
    assert Bn.max() < 0.05 * Bt.max()


def test_hos_batched_and_validation(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    b2 = np.asarray(sp.bicoherence(x, nperseg=64, nfreq=16))
    assert b2.shape == (3, 16, 16)
    with pytest.raises(ValueError):
        sp.bispectrum(x[:, :32], nperseg=64)
    with pytest.raises(ValueError):
        sp.bicoherence(x, nperseg=64, noverlap=64)
