"""AR spectral estimation: model recovery + PSD shape oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

# a stable AR(4) with a sharp resonance near f = 0.12
TRUE_A = np.real(np.poly([0.95 * np.exp(2j * np.pi * 0.12),
                          0.95 * np.exp(-2j * np.pi * 0.12),
                          0.5, -0.6]))


def _ar_signal(rng, n=20000, sigma=1.0):
    e = sigma * rng.standard_normal(n + 200)
    from scipy.signal import lfilter
    x = lfilter([1.0], TRUE_A, e)[200:]
    return x


@pytest.mark.parametrize("fit", ["aryule", "arburg"])
def test_ar_coefficient_recovery(rng, fit):
    x = _ar_signal(rng)
    a, s2, k = getattr(sp, fit)(x, order=4)
    np.testing.assert_allclose(a, TRUE_A, atol=0.03, err_msg=fit)
    assert 0.8 < s2 < 1.2
    assert len(k) == 4 and np.all(np.abs(k) < 1.0)


def test_burg_sharper_on_short_records(rng):
    x = _ar_signal(rng)[:128]
    a_b, s_b, _ = sp.arburg(x, 4)
    f, P = sp.ar_psd(a_b, s_b, nfreq=1024)
    assert abs(f[np.argmax(P)] - 0.12) < 0.02
    # Burg model always stable
    assert np.all(np.abs(np.roots(a_b)) < 1.0)


def test_levinson_matches_direct_solve(rng):
    x = _ar_signal(rng)
    n = len(x)
    xc = x - x.mean()
    r = np.array([xc[: n - k] @ xc[k:] for k in range(6)]) / n
    a, s2, _ = sp.levinson(r, 5)
    # direct Toeplitz solve of the Yule-Walker equations
    from scipy.linalg import toeplitz
    want = np.linalg.solve(toeplitz(r[:5]), -r[1:6])
    np.testing.assert_allclose(a[1:], want, atol=1e-10)


def test_ar_psd_matches_welch(rng):
    x = _ar_signal(rng, n=100000)
    a, s2, _ = sp.aryule(x, 4)
    freqs, P_ar = sp.ar_psd(a, s2, nfreq=129)
    f_w, P_w = sp.welch(x.astype(np.float32), nperseg=256)
    f_w, P_w = np.asarray(f_w), np.asarray(P_w)
    # same density scaling: compare on overlapping interior bins
    sel = (freqs > 0.03) & (freqs < 0.47)
    import numpy as np2
    interp_w = np2.interp(freqs[sel], f_w, P_w)
    ratio = P_ar[sel] / np.maximum(interp_w, 1e-12)
    assert 0.7 < np.median(ratio) < 1.4


def test_ar_validation(rng):
    x = rng.standard_normal(32)
    with pytest.raises(ValueError):
        sp.aryule(x, 0)
    with pytest.raises(ValueError):
        sp.arburg(x, 32)
    with pytest.raises(ValueError):
        sp.levinson(np.array([0.0, 1.0]))
    with pytest.raises(ValueError):
        sp.levinson(np.ones(1))


def test_arburg_dc_offset_consistent_with_aryule(rng):
    # review finding: arburg burned a pole on an un-removed DC offset
    k = np.arange(4000)
    x = 5.0 + _ar_signal(rng, n=4000)
    a_b, _, _ = sp.arburg(x, 4)
    a_y, _, _ = sp.aryule(x, 4)
    np.testing.assert_allclose(a_b, TRUE_A, atol=0.05)
    np.testing.assert_allclose(a_y, TRUE_A, atol=0.05)
