"""Adaptive filters: system identification + cancellation oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

TRUE_W = np.array([0.5, -0.3, 0.2, 0.8, -0.1], np.float32)


def _sysid_data(rng, n=4000, noise=0.01):
    x = rng.standard_normal(n).astype(np.float32)
    d = np.convolve(x, TRUE_W)[: n] + noise * rng.standard_normal(n)
    return x, d.astype(np.float32)


@pytest.mark.parametrize("algo,kw", [
    ("lms_filter", dict(mu=0.02)),
    ("nlms_filter", dict(mu=0.5)),
    ("rls_filter", dict(lam=0.999)),
])
def test_system_identification(rng, algo, kw):
    x, d = _sysid_data(rng)
    y, e, w = getattr(sp, algo)(x, d, n_taps=5, **kw)
    np.testing.assert_allclose(np.asarray(w), TRUE_W, atol=0.02,
                               err_msg=algo)
    # error power collapses after convergence (RLS is near-converged within
    # tens of samples, so compare against the very first ones)
    e = np.asarray(e)
    assert np.mean(e[-500:] ** 2) < 0.05 * np.mean(e[:50] ** 2)


def test_rls_converges_faster_than_lms(rng):
    x, d = _sysid_data(rng, n=600)
    _, e_lms, _ = sp.lms_filter(x, d, 5, mu=0.02)
    _, e_rls, _ = sp.rls_filter(x, d, 5, lam=0.999)
    # after 100 samples RLS error is far below LMS error
    assert (np.mean(np.asarray(e_rls)[100:200] ** 2)
            < 0.3 * np.mean(np.asarray(e_lms)[100:200] ** 2))


def test_noise_cancellation(rng):
    # classic ANC: d = signal + filtered noise; x = noise reference
    n = 12000
    k = np.arange(n)
    s = np.sin(2 * np.pi * 0.01 * k).astype(np.float32)
    noise = rng.standard_normal(n).astype(np.float32)
    leak = np.convolve(noise, [0.7, -0.4, 0.2])[:n].astype(np.float32)
    d = s + leak
    # small mu: the desired signal rides inside e, so misadjustment scales
    # with mu·P(s) — mu=0.05 trades convergence speed for a clean floor
    y, e, _ = sp.nlms_filter(noise, d, n_taps=8, mu=0.05)
    # the error output IS the recovered signal
    rec = np.asarray(e)[n // 2:]
    err = rec - s[n // 2:]
    assert np.mean(err ** 2) < 0.04 * np.mean(leak[n // 2:] ** 2)


def test_warm_start_and_validation(rng):
    x, d = _sysid_data(rng, n=200)
    _, _, w = sp.lms_filter(x, d, 5, mu=0.02, w0=TRUE_W)
    np.testing.assert_allclose(np.asarray(w), TRUE_W, atol=0.05)
    with pytest.raises(ValueError):
        sp.lms_filter(x, d[:-1], 5)
    with pytest.raises(ValueError):
        sp.rls_filter(x, d, 5, lam=0.0)
    with pytest.raises(ValueError):
        sp.nlms_filter(x, d, 0)
