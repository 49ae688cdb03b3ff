"""Chebyshev toolbox vs the numpy.polynomial.chebyshev oracle."""

import numpy as np
import numpy.polynomial.chebyshev as npc
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(21)


@pytest.mark.parametrize("n", [2, 3, 9, 16, 65])
def test_transform_roundtrip_and_oracle(rng, n):
    a = rng.standard_normal(n)
    pts = sp.cheb_points(n, dtype=np.float64)
    v = npc.chebval(pts, a).astype(np.float32)
    c = np.asarray(sp.cheb_transform(v))
    assert np.max(np.abs(c - a)) < 1e-4 * max(1.0, np.abs(a).max())
    back = np.asarray(sp.icheb_transform(c))
    assert np.max(np.abs(back - v)) < 1e-4 * np.abs(v).max()


def test_diff_coef_matches_chebder(rng):
    for n in (1, 2, 5, 12, 33):
        a = rng.standard_normal(n)
        got = np.asarray(sp.cheb_diff_coef(a.astype(np.float32)))
        want = np.zeros(n)
        if n > 1:
            want[: n - 1] = npc.chebder(a)
        assert got.shape == (n,)
        assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.abs(want).max()), n


def test_spectral_derivative_of_smooth_function():
    n = 64
    pts = sp.cheb_points(n, dtype=np.float64)
    v = np.exp(pts) * np.sin(3 * pts)
    want = np.exp(pts) * (np.sin(3 * pts) + 3 * np.cos(3 * pts))
    got = np.asarray(sp.cheb_diff(v.astype(np.float32)))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


def test_second_derivative(rng):
    n = 48
    pts = sp.cheb_points(n, dtype=np.float64)
    v = np.cos(2 * pts)
    got = np.asarray(sp.cheb_diff(v.astype(np.float32), m=2))
    want = -4 * np.cos(2 * pts)
    # Chebyshev differentiation is ill-conditioned near the endpoints
    # (error ~ O(N^4 eps) for the 2nd derivative — Trefethen, Spectral
    # Methods in MATLAB §8); ~1e-2 is the fp32 floor at n=48, not a bug.
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-2
    interior = slice(n // 4, -n // 4)
    assert (
        np.max(np.abs(got[interior] - want[interior])) / np.max(np.abs(want))
        < 1e-3
    )


def test_cheb_eval_matches_chebval(rng):
    c = rng.standard_normal((3, 10)).astype(np.float32)
    x = rng.uniform(-1, 1, (7,)).astype(np.float32)
    got = np.asarray(sp.cheb_eval(c, x))
    assert got.shape == (3, 7)
    for i in range(3):
        want = npc.chebval(x.astype(np.float64), c[i].astype(np.float64))
        assert np.max(np.abs(got[i] - want)) < 1e-4 * max(1.0, np.abs(want).max())
    # scalar x
    s = np.asarray(sp.cheb_eval(c[0], np.float32(0.3)))
    assert s.shape == ()
    assert abs(float(s) - npc.chebval(0.3, c[0].astype(np.float64))) < 1e-4


def test_cheb_eval_jit_grad(rng):
    import jax
    import jax.numpy as jnp

    c = rng.standard_normal(8).astype(np.float32)
    g = jax.jit(jax.grad(lambda xx: sp.cheb_eval(c, xx)))(jnp.float32(0.2))
    # derivative oracle via chebder
    want = npc.chebval(0.2, npc.chebder(c.astype(np.float64)))
    assert abs(float(g) - want) < 1e-3


def test_cheb_errors():
    with pytest.raises(ValueError):
        sp.cheb_points(1)
    with pytest.raises(ValueError):
        sp.cheb_transform(np.ones(1, np.float32))
    with pytest.raises(ValueError):
        sp.cheb_diff(np.ones(8, np.float32), m=-1)
    with pytest.raises(ValueError):
        sp.cheb_eval(np.zeros(0, np.float32), np.float32(0.0))


def test_cheb_eval_single_coefficient():
    v = np.asarray(sp.cheb_eval(np.array([2.5], np.float32), np.float32(0.3)))
    assert v.shape == () and abs(float(v) - 2.5) < 1e-6
    vb = np.asarray(sp.cheb_eval(np.array([2.5], np.float32), np.ones((2, 3), np.float32)))
    assert vb.shape == (2, 3) and np.allclose(vb, 2.5)
