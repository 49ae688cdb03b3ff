"""Dual-tree complex wavelet transform: derived-bank properties (CQF
orthonormality, Hilbert-pair analyticity), perfect reconstruction 1-D/2-D,
near-shift-invariance vs the plain DWT, 2-D orientation selectivity, error
paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.ops.dtcwt import _dt_bank


@pytest.fixture
def rng():
    return np.random.default_rng(17)


@pytest.mark.parametrize("K,L", [(2, 3), (3, 3), (4, 3), (4, 5)])
def test_derived_bank_orthonormal_and_analytic(K, L):
    bank = _dt_bank(K, L)
    for dec in (bank.dec_a, bank.dec_b):
        h = dec[0][::-1]  # rec_lo
        assert len(h) == 2 * (K + L)
        acorr = np.convolve(h, h[::-1])[len(h) - 1 :]
        assert abs(acorr[0] - 1.0) < 1e-12
        assert np.max(np.abs(acorr[2::2])) < 1e-12
        assert abs(h.sum() - np.sqrt(2.0)) < 1e-12
    # Hilbert-pair quality: < 2% negative-frequency energy
    assert bank.analyticity < 0.02


def test_bank_rejects_degenerate_order():
    with pytest.raises(ValueError):
        _dt_bank(0, 3)


@pytest.mark.parametrize("levels", [1, 2, 4])
def test_pr_1d(rng, levels):
    x = rng.standard_normal(256).astype(np.float32)
    yl, yh = sp.dtcwt(x, levels=levels)
    assert yl.shape == (2, 256 >> levels)
    assert len(yh) == levels
    for j, w in enumerate(yh):
        assert w.shape == (256 >> (j + 1),)
        assert np.iscomplexobj(np.asarray(w))
    out = np.asarray(sp.idtcwt(yl, yh))
    assert np.max(np.abs(out - x)) < 1e-5


def test_pr_1d_batched_other_bank(rng):
    x = rng.standard_normal((3, 128)).astype(np.float32)
    yl, yh = sp.dtcwt(x, levels=2, K=4, L=3)
    out = np.asarray(sp.idtcwt(yl, yh, K=4, L=3))
    assert yl.shape == (2, 3, 32)
    assert np.max(np.abs(out - x)) < 1e-5


def test_pr_2d(rng):
    x = rng.standard_normal((64, 96)).astype(np.float32)
    yl, yh = sp.dtcwt2(x, levels=3)
    assert yl.shape == (4, 8, 12)
    assert [np.asarray(w).shape for w in yh] == [
        (6, 32, 48), (6, 16, 24), (6, 8, 12)
    ]
    out = np.asarray(sp.idtcwt2(yl, yh))
    assert np.max(np.abs(out - x)) < 1e-5


def test_shift_invariance_beats_dwt():
    """Per-level energy of |w| under a 1-sample shift: the dual tree holds
    energy ratios near the analytic-frame bound (~0.78 on this harsh
    impulse metric) where the critically-sampled real DWT collapses."""
    x1 = np.zeros(256, np.float32)
    x1[100] = 1.0
    x2 = np.roll(x1, 1)
    _, y1 = sp.dtcwt(x1, levels=3)
    _, y2 = sp.dtcwt(x2, levels=3)
    c1 = sp.wavedec(x1, "db4", level=3)
    c2 = sp.wavedec(x2, "db4", level=3)
    for j in range(3):
        e1 = float(np.sum(np.abs(np.asarray(y1[j])) ** 2))
        e2 = float(np.sum(np.abs(np.asarray(y2[j])) ** 2))
        r_dt = min(e1, e2) / max(e1, e2)
        d1 = float(np.sum(np.asarray(c1[3 - j]) ** 2))
        d2 = float(np.sum(np.asarray(c2[3 - j]) ** 2))
        r_dwt = min(d1, d2) / max(d1, d2)
        assert r_dt > 0.65
        assert r_dt > r_dwt - 0.05  # never meaningfully worse; level 1 exact
    # level 1 is exactly invariant (trees swap under a 1-sample shift)
    e1 = float(np.sum(np.abs(np.asarray(y1[0])) ** 2))
    e2 = float(np.sum(np.abs(np.asarray(y2[0])) ** 2))
    assert abs(e1 - e2) / e1 < 1e-5


def test_orientation_selectivity_2d():
    """±45° gratings separate the HH⁺/HH⁻ bands by >10x, and the mirror
    image swaps them."""
    n = 64
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    g_p = np.cos(2 * np.pi * (i + j) * 6 / n).astype(np.float32)
    g_m = np.cos(2 * np.pi * (i - j) * 6 / n).astype(np.float32)
    _, b_p = sp.dtcwt2(g_p, levels=2)
    _, b_m = sp.dtcwt2(g_m, levels=2)
    e_p = [float(np.sum(np.abs(np.asarray(w)) ** 2)) for w in b_p[1]]
    e_m = [float(np.sum(np.abs(np.asarray(w)) ** 2)) for w in b_m[1]]
    assert e_p[4] > 10 * e_p[5]  # +45 grating -> HH⁺ dominates HH⁻
    assert e_m[5] > 10 * e_m[4]  # mirror swaps
    np.testing.assert_allclose(e_p[4], e_m[5], rtol=1e-4)


def test_error_paths(rng):
    with pytest.raises(ValueError):
        sp.dtcwt(rng.standard_normal(100).astype(np.float32), levels=3)  # 100 % 8
    with pytest.raises(ValueError):
        sp.dtcwt(rng.standard_normal(64).astype(np.float32), levels=0)
    with pytest.raises(ValueError):
        sp.dtcwt(
            (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
                np.complex64
            )
        )
    yl, yh = sp.dtcwt(rng.standard_normal(64).astype(np.float32), levels=2)
    with pytest.raises(ValueError):
        sp.idtcwt(yl[:1], yh)
    with pytest.raises(ValueError):
        sp.idtcwt(yl, [])
    with pytest.raises(ValueError):
        sp.idtcwt2(yl, yh)  # 1-D lowpass into the 2-D inverse


def test_int_input_promoted(rng):
    x = rng.integers(-5, 5, 64).astype(np.int32)
    yl, yh = sp.dtcwt(x, levels=2)
    out = np.asarray(sp.idtcwt(yl, yh))
    assert np.max(np.abs(out - x)) < 1e-4
