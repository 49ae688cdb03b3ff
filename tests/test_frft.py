"""Fractional Fourier transform: dense fp64 sampled-kernel oracle, exact
integer orders, Hermite-Gaussian eigenfunctions (continuous eigenvalues),
order additivity, inverse, axis/batch handling, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def _grid(n):
    return (np.arange(n) - n // 2) / np.sqrt(n)


def _dense_oracle(x, a):
    """fp64 dense evaluation of the 2x-oversampled kernel quadrature —
    what frft computes, by definition (direct regime; reduced orders are
    composed the same way frft does)."""
    n = len(x)
    spec = _cdft64(x)
    pad = np.zeros(2 * n, complex)
    pad[n - n // 2 : n - n // 2 + n] = spec
    xe = np.fft.fftshift(np.fft.ifft(np.fft.ifftshift(pad))) * np.sqrt(
        2 * n
    ) * np.sqrt(2)
    u = (np.arange(2 * n) - n) / (2 * np.sqrt(n))
    alpha = a * np.pi / 2
    cot, csc = 1 / np.tan(alpha), 1 / np.sin(alpha)
    k = np.sqrt(1 - 1j * cot) * np.exp(
        1j
        * np.pi
        * (cot * (u[:, None] ** 2 + u[None, :] ** 2) - 2 * csc * u[:, None] * u[None, :])
    )
    y2 = (k @ xe) / (2 * np.sqrt(n))
    return y2[n - 2 * (n // 2) :: 2]


def _cdft64(x):
    n = len(x)
    return np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(x.astype(np.complex128)))
    ) / np.sqrt(n)


@pytest.mark.parametrize("a", [0.7, 1.3, 2.8, 3.4])
def test_direct_regime_matches_dense_kernel(rng, a):
    n = 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(sp.frft(x, a))
    ref = _dense_oracle(x, a)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize("a", [0.3, 1.9, 3.7])
def test_reduced_regime_matches_composed_oracle(rng, a):
    n = 128
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(sp.frft(x, a))
    ref = _dense_oracle(_cdft64(x), (a - 1.0) % 4.0)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_integer_orders_exact(rng):
    n = 360  # non-pow2, even
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(sp.frft(x, 0)), x, atol=0)
    ref1 = _cdft64(x)
    assert np.max(np.abs(np.asarray(sp.frft(x, 1)) - ref1)) < 1e-5
    # F_2 = F_1 twice; F_3 inverts F_1; orders are taken mod 4
    f2 = np.asarray(sp.frft(x, 2))
    assert np.max(np.abs(f2 - _cdft64(ref1))) < 1e-5
    rt = np.asarray(sp.frft(np.asarray(sp.frft(x, 1)), 3))
    assert np.max(np.abs(rt - x)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(sp.frft(x, 5)), np.asarray(sp.frft(x, 1)), atol=0
    )


@pytest.mark.parametrize("a", [0.3, 0.6, 1.7, 2.5, 3.9])
def test_hermite_gaussian_eigenfunctions(a):
    """The continuous FrFT eigenrelation F_a psi_n = e^{-i n a pi/2} psi_n
    holds to fp32 accuracy on the sampled grid."""
    n = 256
    u = _grid(n)
    psi0 = np.exp(-np.pi * u**2).astype(np.complex64)
    psi1 = (2 * np.sqrt(np.pi) * u * np.exp(-np.pi * u**2)).astype(np.complex64)
    assert np.max(np.abs(np.asarray(sp.frft(psi0, a)) - psi0)) < 1e-5
    lam = np.exp(-1j * a * np.pi / 2)
    assert np.max(np.abs(np.asarray(sp.frft(psi1, a)) - lam * psi1)) < 1e-5


def test_additivity_and_inverse(rng):
    n = 256
    u = _grid(n)
    s = (np.exp(-np.pi * (u / 2) ** 2) * np.cos(2 * np.pi * 3 * u)).astype(
        np.complex64
    )
    y = np.asarray(sp.ifrft(sp.frft(s, 0.8), 0.8))
    assert np.max(np.abs(y - s)) < 1e-5
    y2 = np.asarray(sp.frft(np.asarray(sp.frft(s, 0.6)), 0.7))
    y3 = np.asarray(sp.frft(s, 1.3))
    assert np.max(np.abs(y2 - y3)) < 1e-5


def test_axis_and_batch(rng):
    x = (rng.standard_normal((3, 64)) + 1j * rng.standard_normal((3, 64))).astype(
        np.complex64
    )
    row = np.asarray(sp.frft(x, 0.9))
    for i in range(3):
        np.testing.assert_allclose(
            row[i], np.asarray(sp.frft(x[i], 0.9)), atol=1e-6
        )
    t = np.asarray(sp.frft(x.T, 0.9, axis=0))
    np.testing.assert_allclose(t.T, row, atol=1e-6)


def test_frft2_reduces_to_fft2(rng):
    im = rng.standard_normal((32, 48)).astype(np.float32)
    z = np.asarray(sp.frft2(im, 1.0))
    ref = np.fft.fftshift(
        np.fft.fft2(np.fft.ifftshift(im.astype(np.float64)))
    ) / np.sqrt(32 * 48)
    assert np.max(np.abs(z - ref)) < 1e-5
    # mixed orders roundtrip on a phase-space-concentrated image (the
    # transform's accuracy domain — module docstring): Gaussian-enveloped
    # grating, concentrated in space AND frequency
    u1 = _grid(32)[:, None]
    u2 = _grid(48)[None, :]
    smooth = (
        np.exp(-np.pi * (u1**2 + u2**2) / 2) * np.cos(2 * np.pi * (u1 + u2))
    ).astype(np.float32)
    w = np.asarray(sp.frft2(smooth, (0.7, 1.4)))
    back = np.asarray(sp.frft2(w, (-0.7, -1.4)))
    assert np.max(np.abs(back - smooth)) < 1e-4


def test_real_input_promotes(rng):
    x = rng.standard_normal(64).astype(np.float32)
    y = np.asarray(sp.frft(x, 0.7))
    assert y.dtype == np.complex64
    ref = _dense_oracle(x, 0.7)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_frft2_0d_array_order(rng):
    x = rng.standard_normal((8, 8)).astype(np.float32)
    got = np.asarray(sp.frft2(x, np.array(1.2)))
    want = np.asarray(sp.frft2(x, 1.2))
    assert np.max(np.abs(got - want)) == 0.0


def test_error_paths():
    with pytest.raises(ValueError):
        sp.frft(np.zeros(1, np.float32), 0.5)
    with pytest.raises(ValueError):
        sp.frft(np.float32(3.0), 0.5)
