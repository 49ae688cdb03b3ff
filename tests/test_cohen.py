"""Cohen-class distributions: kernel identity + cross-term suppression."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_wigner_kernel_reproduces_wvd(rng):
    x = rng.standard_normal(256).astype(np.float32)
    w = np.asarray(sp.wigner_ville(x, nperseg=65, hop=4))
    c = np.asarray(sp.cohen_class(x, kernel="wigner", nperseg=65, hop=4))
    np.testing.assert_allclose(c, w, atol=1e-3 * max(1, np.abs(w).max()))


def _two_tone(n=512, f1=0.08, f2=0.18):
    k = np.arange(n)
    return (np.cos(2 * np.pi * f1 * k)
            + np.cos(2 * np.pi * f2 * k)).astype(np.float32)


def _band_energy(D, nperseg, f, width=3):
    # WVD lag-FFT bins live at f_k = k/(2*nperseg) cycles/sample
    b = int(round(f * 2 * nperseg))
    return float(np.abs(D[..., max(b - width, 0):b + width + 1]).sum())


@pytest.mark.parametrize("kernel", ["choi-williams", "born-jordan"])
def test_cross_term_suppression(kernel):
    x = _two_tone()
    npg = 129
    wv = np.asarray(sp.wigner_ville(x, nperseg=npg, hop=2))
    cw = np.asarray(sp.cohen_class(x, kernel=kernel, sigma=0.05,
                                   nperseg=npg, hop=2))
    mid = (0.08 + 0.18) / 2  # cross-terms oscillate at the midpoint freq
    ratio_wv = _band_energy(wv, npg, mid) / _band_energy(wv, npg, 0.18)
    ratio_cw = _band_energy(cw, npg, mid) / _band_energy(cw, npg, 0.18)
    assert ratio_cw < 0.5 * ratio_wv, (kernel, ratio_wv, ratio_cw)
    # auto-terms survive: the tone bands still dominate the floor
    assert _band_energy(cw, npg, 0.18) > 5 * _band_energy(cw, npg, 0.45)


def test_choi_williams_wrapper_and_tone_ridge():
    k = np.arange(400)
    f0 = 0.1
    x = np.cos(2 * np.pi * f0 * k).astype(np.float32)
    npg = 101
    d = np.asarray(sp.choi_williams(x, sigma=0.5, nperseg=npg, hop=4))
    # ridge at the doubled-frequency bin (WVD convention f_k = k/(2*nperseg))
    peak_bin = np.argmax(np.abs(d[d.shape[0] // 2]))
    assert abs(peak_bin - round(f0 * 2 * npg)) <= 1


def test_cohen_validation(rng):
    x = rng.standard_normal(64).astype(np.float32)
    with pytest.raises(ValueError):
        sp.cohen_class(x, kernel="bogus")
    with pytest.raises(ValueError):
        sp.cohen_class(x, nperseg=10)  # even
    with pytest.raises(ValueError):
        sp.cohen_class(x, nperseg=129)  # > T


def test_xwigner_ville_auto_equals_wvd(rng):
    x = rng.standard_normal(200).astype(np.float32)
    w = np.asarray(sp.wigner_ville(x, nperseg=65, hop=4))
    xw = np.asarray(sp.xwigner_ville(x, x, nperseg=65, hop=4))
    np.testing.assert_allclose(np.real(xw), w,
                               atol=1e-3 * max(1, np.abs(w).max()))


def test_xwigner_ville_delay_phase():
    # a pure delay shows up as a linear phase in the cross-WVD at the tone
    k = np.arange(600)
    f0 = 0.1
    x = np.cos(2 * np.pi * f0 * k).astype(np.float32)
    delay = 3
    y = np.cos(2 * np.pi * f0 * (k - delay)).astype(np.float32)
    npg = 101
    xw = np.asarray(sp.xwigner_ville(x, y, nperseg=npg, hop=8))
    bin_f = round(f0 * 2 * npg)
    mid = xw[xw.shape[0] // 2]
    # phase at the common ridge equals 2π f0 · delay (cross-corr phase)
    ph = np.angle(mid[bin_f])
    want = 2 * np.pi * f0 * delay
    assert abs((ph - want + np.pi) % (2 * np.pi) - np.pi) < 0.1
    with pytest.raises(ValueError):
        sp.xwigner_ville(x, y[:-1])
