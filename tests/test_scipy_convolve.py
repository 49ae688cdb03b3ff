"""scipy.signal-named convolution surface vs scipy fp64 oracles.

Covers convolve/correlate (N-D, direct+fft methods), fftconvolve/oaconvolve
aliases, and convolve2d/correlate2d boundary semantics (fill/wrap/symm) —
capability extensions of the reference's 1-D fft_convolve (src/convolve.c).
"""

import numpy as np
import pytest
import scipy.signal as ss

import mixed_radix_fast_fourier_transform_tpu as sp


def _tol(want):
    return 1e-4 * max(1.0, float(np.abs(want).max()))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("method", ["direct", "fft"])
def test_convolve_1d(rng, mode, method):
    a = rng.standard_normal(73).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)
    got = np.asarray(sp.convolve(a, b, mode=mode, method=method))
    want = ss.convolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("method", ["direct", "fft"])
def test_convolve_2d(rng, mode, method):
    a = rng.standard_normal((21, 17)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32)
    got = np.asarray(sp.convolve(a, b, mode=mode, method=method))
    want = ss.convolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("method", ["direct", "fft"])
def test_convolve_complex(rng, method):
    a = (rng.standard_normal(40) + 1j * rng.standard_normal(40)).astype(np.complex64)
    b = (rng.standard_normal(9) + 1j * rng.standard_normal(9)).astype(np.complex64)
    got = np.asarray(sp.convolve(a, b, mode="full", method=method))
    want = ss.convolve(a.astype(np.complex128), b.astype(np.complex128))
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("method", ["direct", "fft"])
def test_correlate(rng, mode, method):
    a = rng.standard_normal(50).astype(np.float32)
    b = rng.standard_normal(13).astype(np.float32)
    got = np.asarray(sp.correlate(a, b, mode=mode, method=method))
    want = ss.correlate(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_correlate_complex_2d(rng):
    a = (rng.standard_normal((12, 14)) + 1j * rng.standard_normal((12, 14))).astype(np.complex64)
    b = (rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))).astype(np.complex64)
    got = np.asarray(sp.correlate(a, b, mode="full", method="fft"))
    want = ss.correlate(a.astype(np.complex128), b.astype(np.complex128), mode="full")
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_fftconvolve_axes(rng):
    a = rng.standard_normal((3, 33)).astype(np.float32)
    b = rng.standard_normal((3, 8)).astype(np.float32)
    got = np.asarray(sp.fftconvolve(a, b, mode="full", axes=1))
    want = ss.fftconvolve(a.astype(np.float64), b.astype(np.float64),
                          mode="full", axes=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_oaconvolve_1d(rng, mode):
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(31).astype(np.float32)
    got = np.asarray(sp.oaconvolve(a, b, mode=mode))
    want = ss.oaconvolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_oaconvolve_nd_fallback(rng):
    a = rng.standard_normal((10, 12)).astype(np.float32)
    b = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sp.oaconvolve(a, b, mode="same"))
    want = ss.oaconvolve(a.astype(np.float64), b.astype(np.float64), mode="same")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_convolve2d_boundaries(rng, boundary, mode):
    a = rng.standard_normal((16, 13)).astype(np.float32)
    b = rng.standard_normal((4, 3)).astype(np.float32)
    got = np.asarray(sp.convolve2d(a, b, mode=mode, boundary=boundary))
    want = ss.convolve2d(a.astype(np.float64), b.astype(np.float64),
                         mode=mode, boundary=boundary)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_convolve2d_fillvalue(rng):
    a = rng.standard_normal((9, 9)).astype(np.float32)
    b = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sp.convolve2d(a, b, mode="full", boundary="fill",
                                   fillvalue=1.5))
    want = ss.convolve2d(a.astype(np.float64), b.astype(np.float64),
                         mode="full", boundary="fill", fillvalue=1.5)
    np.testing.assert_allclose(got, want, atol=_tol(want))


@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_correlate2d(rng, boundary):
    a = rng.standard_normal((11, 10)).astype(np.float32)
    b = rng.standard_normal((3, 5)).astype(np.float32)
    got = np.asarray(sp.correlate2d(a, b, mode="same", boundary=boundary))
    want = ss.correlate2d(a.astype(np.float64), b.astype(np.float64),
                          mode="same", boundary=boundary)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_convolve2d_batched_extension(rng):
    # leading batch dims broadcast (extension over scipy's strict 2-D)
    a = rng.standard_normal((4, 8, 9)).astype(np.float32)
    b = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sp.convolve2d(a, b, mode="same", boundary="symm"))
    for i in range(4):
        want = ss.convolve2d(a[i].astype(np.float64), b.astype(np.float64),
                             mode="same", boundary="symm")
        np.testing.assert_allclose(got[i], want, atol=_tol(want))


def test_convolve_valid_requires_domination(rng):
    a = rng.standard_normal((5, 9)).astype(np.float32)
    b = rng.standard_normal((7, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        sp.convolve(a, b, mode="valid", method="direct")
    with pytest.raises(ValueError):
        sp.convolve2d(a, b, mode="valid")


def test_convolve2d_numpy_scalar_fillvalue(rng):
    # review finding: np.float32 fillvalue was silently treated as zero
    a = rng.standard_normal((8, 8)).astype(np.float32)
    b = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(sp.convolve2d(a, b, boundary="fill",
                                   fillvalue=np.float32(1.5)))
    want = ss.convolve2d(a.astype(np.float64), b.astype(np.float64),
                         boundary="fill", fillvalue=1.5)
    np.testing.assert_allclose(got, want, atol=_tol(want))
    with pytest.raises(ValueError):
        sp.convolve2d(a, b, boundary="fill", fillvalue=np.ones(2))


def test_convolve_method_validation(rng):
    a = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    b = rng.standard_normal((1, 2, 2, 2)).astype(np.float32)
    with pytest.raises(ValueError):
        sp.convolve(a, b, method="bogus")
    with pytest.raises(ValueError):
        sp.convolve(a, b, method="direct")  # >3-D direct unsupported
    with pytest.raises(ValueError):
        sp.convolve(a[0], b, method="fft")  # ndim mismatch
    # auto on >3-D routes to fft and works
    got = np.asarray(sp.convolve(a, b, mode="same"))
    want = ss.convolve(a.astype(np.float64), b.astype(np.float64),
                       mode="same", method="fft")
    np.testing.assert_allclose(got, want, atol=_tol(want))
