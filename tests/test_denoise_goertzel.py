"""Wavelet denoising + Goertzel-class arbitrary-frequency DFT."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _snr(clean, noisy):
    return 10 * np.log10(np.sum(clean**2) / np.sum((noisy - clean) ** 2))


@pytest.mark.parametrize("method", ["universal", "bayes"])
@pytest.mark.parametrize("mode", ["soft", "hard"])
def test_wavelet_denoise_improves_snr(rng, method, mode):
    k = np.arange(2048)
    clean = np.sin(2 * np.pi * 4 * k / 2048) + 0.5 * np.sign(
        np.sin(2 * np.pi * 2 * k / 2048))
    noisy = (clean + 0.3 * rng.standard_normal(2048)).astype(np.float32)
    den = np.asarray(sp.wavelet_denoise(noisy, "db4", method=method,
                                        mode=mode))
    assert den.shape == noisy.shape
    assert _snr(clean, den) > _snr(clean, noisy) + 3.0, (method, mode)


def test_wavelet_denoise_zero_sigma_identity(rng):
    x = rng.standard_normal(512).astype(np.float32)
    out = np.asarray(sp.wavelet_denoise(x, "db2", sigma=0.0, mode="soft"))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_wavelet_denoise_batched(rng):
    x = rng.standard_normal((3, 1024)).astype(np.float32)
    out = np.asarray(sp.wavelet_denoise(x, "sym4", method="bayes"))
    assert out.shape == x.shape
    for i in range(3):
        single = np.asarray(sp.wavelet_denoise(x[i], "sym4", method="bayes"))
        np.testing.assert_allclose(out[i], single, atol=1e-5)


def test_wavelet_denoise_validation(rng):
    x = rng.standard_normal(256).astype(np.float32)
    with pytest.raises(ValueError):
        sp.wavelet_denoise(x, mode="bogus")
    with pytest.raises(ValueError):
        sp.wavelet_denoise(x, method="bogus")


def test_goertzel_matches_fft_bins(rng):
    x = rng.standard_normal(240).astype(np.float32)
    bins = np.array([3, 17, 50])
    got = np.asarray(sp.goertzel(x, bins / 240))
    want = np.fft.fft(x.astype(np.float64))[bins]
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1, np.abs(want).max()))


def test_goertzel_offbin_and_scalar(rng):
    x = rng.standard_normal(500).astype(np.float32)
    f = 0.1234
    got = np.asarray(sp.goertzel(x, f))
    want = np.sum(x.astype(np.float64) * np.exp(-2j * np.pi * f * np.arange(500)))
    assert got.shape == ()
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1, abs(want)))


def test_goertzel_complex_batched_fs(rng):
    x = (rng.standard_normal((2, 300)) + 1j * rng.standard_normal((2, 300))
         ).astype(np.complex64)
    freqs = np.array([697.0, 770.0, 852.0])   # DTMF rows
    got = np.asarray(sp.goertzel(x, freqs, fs=8000.0))
    k = np.arange(300)
    want = np.stack([
        np.sum(x.astype(np.complex128)
               * np.exp(-2j * np.pi * f / 8000.0 * k), axis=-1)
        for f in freqs], axis=-1)
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())


def test_goertzel_dtmf_detection(rng):
    # classic use: detect which DTMF digit is present
    fs = 8000.0
    rows = [697, 770, 852, 941]
    cols = [1209, 1336, 1477, 1633]
    k = np.arange(int(0.04 * fs))
    tone = (np.sin(2 * np.pi * rows[2] * k / fs)
            + np.sin(2 * np.pi * cols[1] * k / fs)
            + 0.1 * rng.standard_normal(len(k))).astype(np.float32)
    mags = np.abs(np.asarray(sp.goertzel(tone, np.array(rows + cols,
                                                        float), fs=fs)))
    assert np.argmax(mags[:4]) == 2 and np.argmax(mags[4:]) == 1


@pytest.mark.parametrize("method", ["universal", "bayes"])
def test_wavelet_denoise2_improves_psnr(rng, method):
    yy, xx = np.mgrid[0:128, 0:128]
    clean = (np.sin(2 * np.pi * yy / 32) * np.cos(2 * np.pi * xx / 24)
             + (xx > 64).astype(float))
    noisy = (clean + 0.4 * rng.standard_normal(clean.shape)).astype(np.float32)
    den = np.asarray(sp.wavelet_denoise2(noisy, "db4", method=method))
    assert den.shape == noisy.shape
    assert _snr(clean, den) > _snr(clean, noisy) + 2.0


def test_wavelet_denoise2_batched_and_identity(rng):
    x = rng.standard_normal((2, 64, 64)).astype(np.float32)
    out = np.asarray(sp.wavelet_denoise2(x, "db2", sigma=0.0))
    np.testing.assert_allclose(out, x, atol=1e-4)
    with pytest.raises(ValueError):
        sp.wavelet_denoise2(x[0, 0])


def test_cycle_spin_improves_on_plain(rng):
    k = np.arange(1024)
    clean = np.sign(np.sin(2 * np.pi * 3 * k / 1024))  # edges = worst case
    noisy = (clean + 0.5 * rng.standard_normal(1024)).astype(np.float32)
    # Haar + edges is where decimation artifacts bite hardest (+2.5 dB)
    plain = np.asarray(sp.wavelet_denoise(noisy, "db1", method="universal"))
    spun = np.asarray(sp.cycle_spin(
        noisy, lambda v: sp.wavelet_denoise(v, "db1", method="universal"),
        max_shifts=15))
    assert spun.shape == noisy.shape
    assert _snr(clean, spun) > _snr(clean, plain) + 1.5


def test_cycle_spin_validation(rng):
    x = rng.standard_normal(64).astype(np.float32)
    with pytest.raises(ValueError):
        sp.cycle_spin(x, lambda v: v, max_shifts=-1)
    with pytest.raises(ValueError):
        sp.cycle_spin(x, lambda v: v[..., :-1])
