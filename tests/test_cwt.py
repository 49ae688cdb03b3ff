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


class TestTorrenceCompo:
    """Frequency-domain Morlet CWT + cross-wavelet analysis (pycwt surface)."""

    def test_cwt_tc_tone_ridge(self):
        t = np.arange(2048)
        f0 = 0.03
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        scales = sp.tc_scales(2048)
        W = np.asarray(sp.cwt_tc(x, scales))
        freqs = (6.0 + np.sqrt(38.0)) / (4.0 * np.pi * scales)
        power = np.abs(W[:, 256:-256]).mean(-1)
        k = int(np.argmax(power))
        assert abs(freqs[k] - f0) / f0 < 0.08  # ridge at the tone, one dj bin

    def test_wct_shared_tone(self):
        rng = np.random.default_rng(3)
        t = np.arange(2048)
        shared = np.sin(2 * np.pi * 0.02 * t)
        x = (shared + 0.5 * rng.standard_normal(2048)).astype(np.float32)
        y = (shared + 0.5 * rng.standard_normal(2048)).astype(np.float32)
        R2, scales, freqs = sp.wct(x, y)
        R2 = np.asarray(R2)
        assert R2.shape == (len(scales), 2048)
        assert R2.min() >= 0.0 and R2.max() <= 1.0
        core = slice(256, -256)
        k = int(np.argmin(np.abs(freqs - 0.02)))
        far = int(np.argmin(np.abs(freqs - 0.2)))
        assert R2[k, core].mean() > 0.95
        assert R2[far, core].mean() < 0.6
        # identical signals: R² == 1 wherever the smoothed power is sane
        R2i, _, _ = sp.wct(x, x)
        strong = np.abs(np.asarray(sp.cwt_tc(x, scales)))[:, core] ** 2
        mask = strong.mean(-1) > 1e-3 * strong.mean()
        assert np.asarray(R2i)[mask][:, core].min() > 0.98

    def test_xwt_phase_of_lag(self):
        # y = quarter-period-delayed copy of x at f0 → relative phase π/2
        t = np.arange(4096)
        f0 = 1.0 / 64.0
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.sin(2 * np.pi * f0 * (t - 16)).astype(np.float32)
        W, scales, freqs = sp.xwt(x, y)
        k = int(np.argmin(np.abs(freqs - f0)))
        ph = np.angle(np.asarray(W)[k, 512:-512]).mean()
        assert abs(ph - np.pi / 2) < 0.1, ph

    def test_jit_batch_and_errors(self):
        import jax

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 512)).astype(np.float32)
        scales = sp.tc_scales(512)
        W = np.asarray(jax.jit(lambda v: sp.cwt_tc(v, scales))(x))
        assert W.shape == (2, len(scales), 512)
        with pytest.raises(ValueError):
            sp.cwt_tc(x, [-1.0])
        with pytest.raises(ValueError):
            sp.wct(x[0], np.zeros(100, np.float32))
        with pytest.raises(ValueError):
            sp.tc_scales(4, s0=100.0)
