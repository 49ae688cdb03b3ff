"""Chirp-z transform (czt / zoom_fft) vs direct fp64 evaluation.

Capability extension generalizing the engine's Bluestein path (reference:
src/highSpeedFFT.c:1735-1907 hard-codes the DFT case); oracle is the direct
O(n·m) sum in fp64.
"""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _direct_czt(x, m, w, a):
    n = x.shape[-1]
    k = np.arange(m)
    z = a * w ** (-k.astype(np.float64))
    nn = np.arange(n)
    return np.stack(
        [np.sum(x.astype(np.complex128) * zk ** (-nn), axis=-1) for zk in z],
        axis=-1,
    )


@pytest.mark.parametrize("n", [1, 8, 15, 100, 360])
def test_default_is_dft(rng, n):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(
        np.complex64
    )
    got = np.asarray(sp.czt(x))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_spiral_points(rng):
    n, m = 24, 17
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    w = 0.99 * np.exp(-2j * np.pi / 31)
    a = 1.02 * np.exp(0.3j)
    got = np.asarray(sp.czt(x, m=m, w=w, a=a))
    want = _direct_czt(x, m, w, a)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 5e-5


def test_m_larger_than_n(rng):
    n, m = 16, 40
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    w = np.exp(-2j * np.pi / m)
    got = np.asarray(sp.czt(x, m=m, w=w))
    want = np.fft.fft(x.astype(np.complex128), n=m)  # zero-padded DFT
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_large_n_phase_accuracy(rng):
    """Exercises the fractional-turn exponent reduction: naive fp64 pow at
    j²/2 ~ 5e7 would lose ~1e-9 turns of phase per unit exponent error."""
    n = 10007
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(sp.czt(x))
    want = np.fft.fft(x.astype(np.complex128))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_zoom_fft_band_matches_scipy(rng):
    """scipy.signal.zoom_fft semantics: endpoint-EXCLUSIVE frequency grid
    f1 + k·(f2−f1)/m."""
    scipy_signal = pytest.importorskip("scipy.signal")
    n, fs = 128, 1.0
    x = rng.standard_normal(n).astype(np.float32)
    f1, f2, m = 10 / n, 30 / n, 21
    got = np.asarray(sp.zoom_fft(x, [f1, f2], m=m, fs=fs))
    want = scipy_signal.zoom_fft(x.astype(np.float64), [f1, f2], m=m, fs=fs)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_zoom_fft_matches_fft_bins(rng):
    """zoom_fft over the full band [0, fs) with m = n reproduces FFT bins."""
    n = 64
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(sp.zoom_fft(x, [0.0, 2.0], m=n, fs=2.0))
    want = np.fft.fft(x.astype(np.float64))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_invalid_args(rng):
    x = (rng.standard_normal(8) + 0j).astype(np.complex64)
    with pytest.raises(ValueError):
        sp.czt(x, m=0)
    with pytest.raises(ValueError):
        sp.czt(x, w=0.0)
    with pytest.raises(ValueError):
        sp.czt(x, a=0.0)


def test_czt_points_vs_scipy():
    import scipy.signal as ss

    for kw in (dict(m=16,), dict(m=9, w=np.exp(-2j * np.pi / 32)),
               dict(m=7, w=0.99 * np.exp(-2j * np.pi / 11), a=1.1 + 0.1j)):
        got = sp.czt_points(**kw)
        want = ss.czt_points(**kw)
        np.testing.assert_allclose(got, want, rtol=1e-12)
    with pytest.raises(ValueError):
        sp.czt_points(0)
