"""CWT: wavelet samplers vs closed forms, transform vs a direct
np.convolve oracle implementing the scipy.signal.cwt recipe."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _oracle_cwt(data, wavelet, widths):
    out = []
    for wd in widths:
        points = min(10 * wd, len(data))
        kern = np.conj(np.asarray(wavelet(points, wd))[::-1])
        out.append(np.convolve(data, kern, mode="same"))
    return np.stack(out)


def test_ricker_closed_form():
    a = 4.0
    w = sp.ricker(41, a)
    t = np.arange(41) - 20.0
    want = (
        2.0 / (np.sqrt(3.0 * a) * np.pi**0.25)
        * (1 - (t / a) ** 2)
        * np.exp(-(t**2) / (2 * a**2))
    )
    np.testing.assert_allclose(w, want, atol=1e-12)
    # zero crossings at t = +-a, peak at centre
    assert abs(w[20 + 4]) < 1e-12 and w[20] == w.max()


def test_morlet2_closed_form():
    s, w0 = 3.0, 5.0
    w = sp.morlet2(30, s, w0)
    t = (np.arange(30) - 14.5) / s
    want = np.pi**-0.25 * np.sqrt(1 / s) * np.exp(1j * w0 * t - t**2 / 2)
    np.testing.assert_allclose(w, want, atol=1e-12)


def test_cwt_ricker_matches_oracle(rng):
    x = rng.standard_normal(300)
    widths = [1, 3, 7.5, 30]  # includes float width and the 10w > N clamp
    got = np.asarray(sp.cwt(x.astype(np.float32), sp.ricker, widths))
    want = _oracle_cwt(x, sp.ricker, widths)
    assert got.shape == want.shape == (4, 300)
    assert got.dtype == np.float32
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_cwt_morlet2_complex(rng):
    x = rng.standard_normal(257)  # odd length (Bluestein-adjacent padding)
    widths = np.arange(1, 9)
    got = np.asarray(sp.cwt(x.astype(np.float32), sp.morlet2, widths))
    want = _oracle_cwt(x, sp.morlet2, widths)
    assert got.dtype == np.complex64
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_cwt_localizes_frequency(rng):
    """A pure tone's |CWT| row maximizes at the matched morlet2 scale."""
    fs, f0 = 1000.0, 50.0
    t = np.arange(1024) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    w0 = 5.0
    widths = w0 * fs / (2 * np.pi * np.array([20.0, 50.0, 125.0]))
    got = np.abs(np.asarray(sp.cwt(x, sp.morlet2, widths)))
    power = got[:, 200:-200].mean(axis=1)
    assert np.argmax(power) == 1


def test_cwt_batched(rng):
    x = rng.standard_normal((2, 3, 120)).astype(np.float32)
    got = np.asarray(sp.cwt(x, sp.ricker, [2, 5]))
    assert got.shape == (2, 2, 3, 120)
    single = np.asarray(sp.cwt(x[1, 0], sp.ricker, [2, 5]))
    np.testing.assert_allclose(got[:, 1, 0], single, atol=2e-5)


def test_cwt_errors(rng):
    with pytest.raises(ValueError):
        sp.cwt(np.zeros(0, np.float32), sp.ricker, [1])
    with pytest.raises(ValueError):
        sp.cwt(np.ones(8, np.float32), sp.ricker, [])
    with pytest.raises(ValueError):
        sp.ricker(0, 1.0)
    with pytest.raises(ValueError):
        sp.morlet2(0, 1.0)
