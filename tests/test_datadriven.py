"""SSA + DMD: additivity, separation, and linear-system recovery oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_ssa_additivity(rng):
    x = rng.standard_normal(300)
    comps, s = sp.ssa(x, window=40, n_components=5)
    np.testing.assert_allclose(comps.sum(axis=0), x, atol=1e-10)
    assert np.all(np.diff(s) <= 1e-12)  # singular values descending


def test_ssa_trend_tone_separation(rng):
    k = np.arange(400)
    trend = 0.02 * k
    tone = np.sin(2 * np.pi * 0.05 * k)
    x = trend + tone + 0.05 * rng.standard_normal(400)
    comps, s = sp.ssa(x, window=80, groups=[[0], [1, 2]])
    # group 0 tracks the trend, group [1,2] the tone (interior samples)
    sl = slice(40, -40)

    def corr(a, b):
        a = a[sl] - a[sl].mean()
        b = b[sl] - b[sl].mean()
        return abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)

    assert corr(comps[0], trend) > 0.99
    assert corr(comps[1], tone) > 0.99
    np.testing.assert_allclose(comps.sum(axis=0), x, atol=1e-10)


def test_ssa_validation(rng):
    x = rng.standard_normal(64)
    with pytest.raises(ValueError):
        sp.ssa(x, window=1)
    with pytest.raises(ValueError):
        sp.ssa(x, window=64)
    with pytest.raises(ValueError):
        sp.ssa(np.zeros((2, 32)), window=8)
    with pytest.raises(ValueError):
        sp.ssa(x, window=8, groups=[[99]])


def test_dmd_recovers_linear_system(rng):
    # snapshots of x_{k+1} = A x_k: DMD eigenvalues == eig(A) exactly
    th = 0.3
    A = 0.97 * np.array([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]])
    x0 = np.array([1.0, 0.5])
    snaps = [x0]
    for _ in range(40):
        snaps.append(A @ snaps[-1])
    X = np.stack(snaps, axis=1)
    modes, eigs, amps, omega = sp.dmd(X)
    np.testing.assert_allclose(np.sort_complex(eigs),
                               np.sort_complex(np.linalg.eigvals(A)),
                               atol=1e-10)
    # continuous rates: growth log(0.97), frequency ±0.3 rad/step
    np.testing.assert_allclose(np.sort(omega.imag), [-th, th], atol=1e-10)
    recon = sp.dmd_reconstruct(modes, eigs, amps, X.shape[1])
    np.testing.assert_allclose(recon.real, X, atol=1e-8)


def test_dmd_forecast_beyond_data():
    th, rho = 0.2, 1.0
    A = rho * np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
    snaps = [np.array([1.0, 0.0])]
    for _ in range(30):
        snaps.append(A @ snaps[-1])
    X = np.stack(snaps, axis=1)
    modes, eigs, amps, _ = sp.dmd(X[:, :20])  # train on a prefix
    fut = sp.dmd_reconstruct(modes, eigs, amps, 31)
    np.testing.assert_allclose(fut.real[:, 20:], X[:, 20:31], atol=1e-8)


def test_dmd_rank_truncation_and_validation(rng):
    X = rng.standard_normal((6, 30))
    modes, eigs, amps, _ = sp.dmd(X, rank=3)
    assert modes.shape[1] == 3 and len(eigs) == 3
    with pytest.raises(ValueError):
        sp.dmd(X[:, :1])
    with pytest.raises(ValueError):
        sp.dmd(rng.standard_normal(30))


def test_ssa_rejects_overlapping_groups(rng):
    # review finding: double-counted indices silently broke additivity
    x = rng.standard_normal(100)
    with pytest.raises(ValueError):
        sp.ssa(x, window=20, groups=[[0], [0, 1]])
