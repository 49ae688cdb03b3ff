"""ShortTimeFFT class + COLA/NOLA/dual-window helpers vs scipy 1.17 oracles."""

import numpy as np
import pytest
import scipy.signal as ss

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu import ShortTimeFFT


def _tol(want):
    return 1e-4 * max(1.0, float(np.abs(want).max()))


# ------------------------------------------------------------- window helpers

@pytest.mark.parametrize("window,nperseg,noverlap,expect", [
    ("hann", 64, 32, True),
    ("hann", 64, 16, False),
    ("boxcar", 64, 0, True),
    ("bartlett", 64, 48, True),
])
def test_check_cola(window, nperseg, noverlap, expect):
    got = sp.check_COLA(window, nperseg, noverlap)
    assert got == ss.check_COLA(window, nperseg, noverlap) == expect


@pytest.mark.parametrize("window,nperseg,noverlap", [
    ("hann", 64, 32), ("hann", 64, 16), ("boxcar", 64, 0),
    ("blackman", 60, 20),
])
def test_check_nola(window, nperseg, noverlap):
    assert sp.check_NOLA(window, nperseg, noverlap) == \
        ss.check_NOLA(window, nperseg, noverlap)


def test_check_nola_failing_window():
    w = np.zeros(32)
    w[:8] = 1.0  # hop 16 leaves empty residue classes
    assert sp.check_NOLA(w, 32, 16) == ss.check_NOLA(w, 32, 16) == False  # noqa: E712


@pytest.mark.parametrize("scaled", [True, False])
@pytest.mark.parametrize("hop", [8, 12, 16])
def test_closest_dual_window(rng, scaled, hop):
    win = ss.windows.hann(48, sym=False)
    desired = rng.standard_normal(48) * 0.1 + 1.0
    got, a_got = sp.closest_STFT_dual_window(win, hop, desired, scaled=scaled)
    want, a_want = ss.closest_STFT_dual_window(win, hop, desired,
                                               scaled=scaled)
    np.testing.assert_allclose(got, want, atol=1e-12)
    np.testing.assert_allclose(a_got, a_want, atol=1e-12)


def test_closest_dual_default_rect():
    win = ss.windows.bartlett(24, sym=False)
    got, ag = sp.closest_STFT_dual_window(win, 6)
    want, aw = ss.closest_STFT_dual_window(win, 6)
    np.testing.assert_allclose(got, want, atol=1e-12)
    np.testing.assert_allclose(ag, aw, atol=1e-12)


# ----------------------------------------------------------------- index math

def _pair(win=None, hop=9, fs=100.0, **kw):
    if win is None:
        win = ss.windows.hann(32, sym=False)
    return (ShortTimeFFT(win, hop, fs, **kw),
            ss.ShortTimeFFT(win, hop, fs, **kw))


def test_index_geometry_matches_scipy():
    ours, ref = _pair()
    n = 200
    assert ours.p_min == ref.p_min
    assert ours.k_min == ref.k_min
    assert ours.p_max(n) == ref.p_max(n)
    assert ours.k_max(n) == ref.k_max(n)
    assert ours.p_num(n) == ref.p_num(n)
    assert ours.lower_border_end() == ref.lower_border_end
    assert ours.upper_border_begin(n) == ref.upper_border_begin(n)
    assert ours.m_num_mid == ref.m_num_mid
    assert ours.f_pts == ref.f_pts
    np.testing.assert_allclose(ours.f, ref.f)
    np.testing.assert_allclose(ours.t(n), ref.t(n))
    np.testing.assert_allclose(ours.extent(n), ref.extent(n))
    np.testing.assert_allclose(ours.dual_win, ref.dual_win, atol=1e-12)
    assert ours.invertible == ref.invertible
    assert ours.delta_t == ref.delta_t and ours.delta_f == ref.delta_f


def test_index_geometry_zero_padded_window():
    win = np.zeros(40)
    win[5:35] = ss.windows.hamming(30, sym=False)
    ours, ref = _pair(win=win, hop=7)
    n = 150
    assert ours.p_min == ref.p_min and ours.k_min == ref.k_min
    assert ours.p_max(n) == ref.p_max(n) and ours.k_max(n) == ref.k_max(n)
    assert ours.lower_border_end() == ref.lower_border_end
    assert ours.upper_border_begin(n) == ref.upper_border_begin(n)


# ------------------------------------------------------------------ transform

@pytest.mark.parametrize("fft_mode", ["twosided", "centered", "onesided"])
@pytest.mark.parametrize("padding", ["zeros", "edge", "even", "odd"])
def test_stft_matches_scipy(rng, fft_mode, padding):
    x = rng.standard_normal(171).astype(np.float64)
    ours, ref = _pair(fft_mode=fft_mode)
    got = np.asarray(ours.stft(x.astype(np.float32), padding=padding))
    want = ref.stft(x, padding=padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_stft_onesided2x_psd(rng):
    x = rng.standard_normal(120)
    win = ss.windows.hann(24, sym=False)
    ours = ShortTimeFFT(win, 6, 1e3, fft_mode="onesided2X", scale_to="psd")
    ref = ss.ShortTimeFFT(win, 6, 1e3, fft_mode="onesided2X", scale_to="psd")
    got = np.asarray(ours.stft(x.astype(np.float32)))
    want = ref.stft(x)
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_stft_mfft_and_phase_shift(rng):
    x = rng.standard_normal(100)
    win = ss.windows.hamming(20, sym=False)
    for ps in (0, None, 3):
        ours = ShortTimeFFT(win, 5, 10.0, mfft=32, phase_shift=ps)
        ref = ss.ShortTimeFFT(win, 5, 10.0, mfft=32, phase_shift=ps)
        got = np.asarray(ours.stft(x.astype(np.float32)))
        want = ref.stft(x)
        np.testing.assert_allclose(got, want, atol=_tol(want),
                                   err_msg=f"phase_shift={ps}")


def test_stft_complex_twosided(rng):
    x = (rng.standard_normal(90) + 1j * rng.standard_normal(90))
    ours, ref = _pair(fft_mode="twosided")
    got = np.asarray(ours.stft(x.astype(np.complex64)))
    want = ref.stft(x)
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_stft_slice_range_and_axis(rng):
    x = rng.standard_normal((3, 140)).astype(np.float32)
    ours, ref = _pair()
    got = np.asarray(ours.stft(x, p0=2, p1=10, axis=-1))
    want = ref.stft(x.astype(np.float64), p0=2, p1=10, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_stft_detrend(rng):
    x = (rng.standard_normal(130) + np.linspace(0, 4, 130))
    ours, ref = _pair()
    for detr in ("constant", "linear"):
        got = np.asarray(ours.stft_detrend(x.astype(np.float32), detr))
        want = ref.stft_detrend(x, detr)
        np.testing.assert_allclose(got, want, atol=_tol(want),
                                   err_msg=detr)


def test_spectrogram_and_cross(rng):
    x = rng.standard_normal(128).astype(np.float32)
    y = rng.standard_normal(128).astype(np.float32)
    ours, ref = _pair()
    np.testing.assert_allclose(
        np.asarray(ours.spectrogram(x)),
        ref.spectrogram(x.astype(np.float64)), atol=1e-3)
    got = np.asarray(ours.spectrogram(x, y))
    want = ref.spectrogram(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("fft_mode", ["twosided", "onesided"])
def test_istft_roundtrip(rng, fft_mode):
    x = rng.standard_normal(160).astype(np.float32)
    ours, ref = _pair(fft_mode=fft_mode)
    S = ours.stft(x)
    got = np.asarray(ours.istft(S, k1=len(x)))
    np.testing.assert_allclose(got, x, atol=2e-5)


def test_istft_matches_scipy_on_modified(rng):
    # istft of a *non*-consistent spectrogram must match scipy's projection
    x = rng.standard_normal(144)
    ours, ref = _pair()
    S_ref = ref.stft(x)
    S_mod = S_ref * np.exp(1j * 0.1 * np.arange(S_ref.shape[-1]))
    want = ref.istft(S_mod, k1=len(x))
    got = np.asarray(ours.istft(S_mod.astype(np.complex64), k1=len(x)))
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_istft_k0_k1_window(rng):
    x = rng.standard_normal(160)
    ours, ref = _pair()
    S = ref.stft(x)
    k0, k1 = 30, 130
    want = ref.istft(S, k0=k0, k1=k1)
    got = np.asarray(ours.istft(S.astype(np.complex64), k0=k0, k1=k1))
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_scale_to_and_factors():
    win = ss.windows.hann(32, sym=False)
    ours = ShortTimeFFT(win, 8, 250.0)
    ref = ss.ShortTimeFFT(win, 8, 250.0)
    assert np.isclose(ours.fac_magnitude, ref.fac_magnitude)
    assert np.isclose(ours.fac_psd, ref.fac_psd)
    ours.scale_to("psd")
    ref.scale_to("psd")
    np.testing.assert_allclose(ours.win, ref.win, atol=1e-14)
    np.testing.assert_allclose(ours.dual_win, ref.dual_win, atol=1e-14)
    assert ours.scaling == ref.scaling == "psd"


def test_from_window_and_from_dual(rng):
    ours = ShortTimeFFT.from_window("hann", 1e3, 48, 36)
    ref = ss.ShortTimeFFT.from_window("hann", 1e3, 48, 36)
    np.testing.assert_allclose(ours.win, ref.win, atol=1e-14)
    assert ours.hop == ref.hop

    dual = ss.windows.hamming(36, sym=False)
    ours2 = ShortTimeFFT.from_dual(dual, 9, 1.0)
    ref2 = ss.ShortTimeFFT.from_dual(dual, 9, 1.0)
    np.testing.assert_allclose(ours2.win, ref2.win, atol=1e-14)
    np.testing.assert_allclose(ours2.dual_win, ref2.dual_win, atol=1e-14)


def test_from_win_equals_dual():
    desired = ss.windows.hann(36, sym=False) + 0.1
    for scale in (None, "unitary"):
        ours = ShortTimeFFT.from_win_equals_dual(desired, 9, 1.0,
                                                 scale_to=scale)
        ref = ss.ShortTimeFFT.from_win_equals_dual(desired, 9, 1.0,
                                                   scale_to=scale)
        np.testing.assert_allclose(ours.win, ref.win, atol=1e-14)
        np.testing.assert_allclose(ours.dual_win, ref.dual_win, atol=1e-14)
        assert ours.scaling == ref.scaling


def test_validation_errors():
    win = ss.windows.hann(16, sym=False)
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 0, 1.0)
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 4, 1.0, mfft=8)
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 4, 1.0, fft_mode="bogus")
    with pytest.raises(ValueError):
        ShortTimeFFT(win, 4, 1.0, fft_mode="onesided2X")  # needs scale_to
    s = ShortTimeFFT(win, 4, 1.0)
    with pytest.raises(ValueError):
        s.stft(np.zeros(100, np.complex64))  # complex x with onesided
    with pytest.raises(ValueError):
        s.stft(np.zeros(100, np.float32), p0=0, p1=999)
    with pytest.raises(ValueError):
        s.istft(np.zeros((5, 5), np.complex64))  # wrong f_pts


def test_istft_batched_and_negative_k0(rng):
    x = rng.standard_normal((2, 3, 150))
    ours, ref = _pair()
    S_ref = ref.stft(x)                      # (2, 3, f, P)
    got = np.asarray(ours.istft(S_ref.astype(np.complex64), k1=150))
    want = ref.istft(S_ref, k1=150)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))
    if ref.k_min < 0:
        k0 = max(ref.k_min, -8)
        got = np.asarray(ours.istft(S_ref.astype(np.complex64), k0=k0, k1=100))
        want = ref.istft(S_ref, k0=k0, k1=100)
        np.testing.assert_allclose(got, want, atol=_tol(want))


def test_stft_istft_t_f_axes(rng):
    x = rng.standard_normal((4, 120))
    ours, ref = _pair(fft_mode="twosided")
    S = ref.stft(x, axis=-1)
    # move f/t: istft with explicit f_axis/t_axis on a permuted S
    Sp = np.moveaxis(S, (-2, -1), (0, 1))    # (f, t, batch)
    got = np.asarray(ours.istft(Sp.astype(np.complex64), k1=120,
                                f_axis=0, t_axis=1))
    want = ref.istft(Sp, k1=120, f_axis=0, t_axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=_tol(want))


def test_istft_negative_k0_sweep(rng):
    # review finding: q0 must clamp to p_min for k0 < 0 (crash/wrap before)
    x = rng.standard_normal(150)
    for win, hop in ((ss.windows.hann(32, sym=False), 9),
                     (ss.windows.hamming(16, sym=False), 16)):
        ours = ShortTimeFFT(win, hop, 100.0)
        ref = ss.ShortTimeFFT(win, hop, 100.0)
        S = ref.stft(x)
        for k0 in range(ref.k_min, 1, 3):
            got = np.asarray(ours.istft(S.astype(np.complex64), k0=k0,
                                        k1=120))
            assert np.all(np.isfinite(got)) and got.shape == (120 - k0,)
            try:
                want = ref.istft(S, k0=k0, k1=120)
            except ValueError:
                # scipy 1.17 crashes on some hop==m_num negative-k0 cases
                # (its own q0 is unclamped); ours is defined everywhere
                continue
            np.testing.assert_allclose(got, want, atol=_tol(want),
                                       err_msg=f"hop={hop} k0={k0}")
