"""Empirical wavelet transform: additivity + adaptive separation oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_ewt_exact_additivity_and_separation(rng):
    k = np.arange(2048)
    t1 = np.cos(2 * np.pi * 0.04 * k)
    t2 = 0.8 * np.cos(2 * np.pi * 0.19 * k + 0.5)
    x = (t1 + t2 + 0.03 * rng.standard_normal(2048)).astype(np.float32)
    bands, bounds = sp.ewt(x, n_bands=2)
    bands = np.asarray(bands)
    np.testing.assert_allclose(bands.sum(axis=0), x, atol=2e-5)
    assert 0.04 < bounds[0] < 0.19
    assert _corr(bands[0], t1) > 0.99
    assert _corr(bands[1], t2) > 0.99


def test_ewt_explicit_boundaries_batched_jits(rng):
    import jax

    x = rng.standard_normal((2, 1024)).astype(np.float32)
    fn = jax.jit(lambda v: sp.ewt(v, boundaries=np.array([0.1, 0.3]))[0])
    bands = np.asarray(fn(x))
    assert bands.shape == (2, 3, 1024)
    np.testing.assert_allclose(bands.sum(axis=1), x, atol=2e-5)


def test_ewt_boundaries_rule(rng):
    k = np.arange(4096)
    x = (np.cos(2 * np.pi * 0.05 * k) + np.cos(2 * np.pi * 0.25 * k))
    b = sp.ewt_boundaries(x, 2)
    assert b.shape == (1,) and 0.05 < b[0] < 0.25


def test_ewt_validation(rng):
    x = rng.standard_normal(256).astype(np.float32)
    with pytest.raises(ValueError):
        sp.ewt(x)  # neither n_bands nor boundaries
    with pytest.raises(ValueError):
        sp.ewt(x, boundaries=np.array([0.3, 0.1]))
    with pytest.raises(ValueError):
        sp.ewt(x, boundaries=np.array([0.6]))
    with pytest.raises(ValueError):
        sp.ewt_boundaries(x, 1)


def test_ewt_odd_length_exact_bins(rng):
    # review finding: boundary bin conversion must use k/n, not k/(n-1)
    n = 1025
    k = np.arange(n)
    x = (np.cos(2 * np.pi * 0.06 * k)
         + np.cos(2 * np.pi * 0.3 * k)).astype(np.float32)
    bands, b = sp.ewt(x, n_bands=2)
    bands = np.asarray(bands)
    np.testing.assert_allclose(bands.sum(axis=0), x, atol=2e-5)
    assert 0.06 < b[0] < 0.3
