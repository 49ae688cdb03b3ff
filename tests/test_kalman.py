"""Parallel-in-time Kalman filter/smoother vs sequential + fp64 oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _model(d=4, d_obs=2, seed=0):
    rng = np.random.default_rng(seed)
    # a stable random system
    F = rng.standard_normal((d, d))
    F *= 0.95 / max(np.abs(np.linalg.eigvals(F)))
    Lq = 0.1 * rng.standard_normal((d, d))
    Q = Lq @ Lq.T + 0.01 * np.eye(d)
    H = rng.standard_normal((d_obs, d))
    Lr = 0.3 * rng.standard_normal((d_obs, d_obs))
    R = Lr @ Lr.T + 0.05 * np.eye(d_obs)
    m0 = rng.standard_normal(d)
    P0 = np.eye(d)
    return F, Q, H, R, m0, P0


def _simulate(F, Q, H, R, m0, P0, T, seed=1):
    rng = np.random.default_rng(seed)
    d, d_obs = F.shape[0], H.shape[0]
    x = rng.multivariate_normal(m0, P0)
    xs, ys = [], []
    for _ in range(T):
        x = F @ x + rng.multivariate_normal(np.zeros(d), Q)
        ys.append(H @ x + rng.multivariate_normal(np.zeros(d_obs), R))
        xs.append(x)
    return np.array(xs), np.array(ys)


def _kf_numpy(F, Q, H, R, m0, P0, ys):
    m, P = m0.copy(), P0.copy()
    ms, Ps = [], []
    for y in ys:
        m = F @ m
        P = F @ P @ F.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        m = m + K @ (y - H @ m)
        P = (np.eye(len(m)) - K @ H) @ P
        ms.append(m.copy())
        Ps.append(P.copy())
    return np.array(ms), np.array(Ps)


def _rts_numpy(F, Q, ms, Ps):
    T = len(ms)
    gs, Ls = [ms[-1]], [Ps[-1]]
    for k in range(T - 2, -1, -1):
        P_pred = F @ Ps[k] @ F.T + Q
        G = Ps[k] @ F.T @ np.linalg.inv(P_pred)
        gs.append(ms[k] + G @ (gs[-1] - F @ ms[k]))
        Ls.append(Ps[k] + G @ (Ls[-1] - P_pred) @ G.T)
    return np.array(gs[::-1]), np.array(Ls[::-1])


def test_parallel_filter_matches_sequential():
    F, Q, H, R, m0, P0 = _model()
    _, ys = _simulate(F, Q, H, R, m0, P0, 200)
    mp, Pp = sp.kalman_filter(F, Q, H, R, m0, P0, ys, parallel=True)
    msq, Psq = sp.kalman_filter(F, Q, H, R, m0, P0, ys, parallel=False)
    scale = max(1.0, float(np.abs(np.asarray(msq)).max()))
    np.testing.assert_allclose(np.asarray(mp), np.asarray(msq),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(Pp), np.asarray(Psq), atol=2e-4)


def test_filter_matches_fp64_oracle():
    F, Q, H, R, m0, P0 = _model(seed=3)
    _, ys = _simulate(F, Q, H, R, m0, P0, 150, seed=4)
    want_m, want_P = _kf_numpy(F, Q, H, R, m0, P0, ys)
    for parallel in (True, False):
        got_m, got_P = sp.kalman_filter(F, Q, H, R, m0, P0, ys,
                                        parallel=parallel)
        scale = max(1.0, np.abs(want_m).max())
        np.testing.assert_allclose(np.asarray(got_m), want_m,
                                   atol=3e-4 * scale)
        np.testing.assert_allclose(np.asarray(got_P), want_P, atol=3e-4)


def test_smoother_matches_fp64_oracle():
    F, Q, H, R, m0, P0 = _model(seed=5)
    _, ys = _simulate(F, Q, H, R, m0, P0, 120, seed=6)
    fm, fP = _kf_numpy(F, Q, H, R, m0, P0, ys)
    want_m, want_P = _rts_numpy(F, Q, fm, fP)
    for parallel in (True, False):
        got_m, got_P = sp.kalman_smoother(F, Q, H, R, m0, P0, ys,
                                          parallel=parallel)
        scale = max(1.0, np.abs(want_m).max())
        np.testing.assert_allclose(np.asarray(got_m), want_m,
                                   atol=5e-4 * scale, err_msg=str(parallel))
        np.testing.assert_allclose(np.asarray(got_P), want_P, atol=5e-4)


def test_smoothing_reduces_uncertainty_and_error():
    F, Q, H, R, m0, P0 = _model(seed=7)
    xs, ys = _simulate(F, Q, H, R, m0, P0, 300, seed=8)
    fm, fP = sp.kalman_filter(F, Q, H, R, m0, P0, ys)
    sm, sP = sp.kalman_smoother(F, Q, H, R, m0, P0, ys)
    # interior smoothed variance strictly below filtered variance
    tr_f = np.trace(np.asarray(fP), axis1=1, axis2=2)
    tr_s = np.trace(np.asarray(sP), axis1=1, axis2=2)
    assert np.all(tr_s[:-1] <= tr_f[:-1] + 1e-5)
    assert tr_s[: -1].mean() < 0.95 * tr_f[:-1].mean()
    # and the smoothed track is closer to the truth
    err_f = np.mean((np.asarray(fm) - xs) ** 2)
    err_s = np.mean((np.asarray(sm) - xs) ** 2)
    assert err_s < err_f


def test_long_sequence_parallel_stability():
    F, Q, H, R, m0, P0 = _model(d=2, d_obs=1, seed=9)
    _, ys = _simulate(F, Q, H, R, m0, P0, 4096, seed=10)
    mp, Pp = sp.kalman_filter(F, Q, H, R, m0, P0, ys, parallel=True)
    msq, _ = sp.kalman_filter(F, Q, H, R, m0, P0, ys, parallel=False)
    scale = max(1.0, float(np.abs(np.asarray(msq)).max()))
    np.testing.assert_allclose(np.asarray(mp)[-512:],
                               np.asarray(msq)[-512:], atol=1e-3 * scale)


def test_kalman_validation():
    F, Q, H, R, m0, P0 = _model()
    with pytest.raises(ValueError):
        sp.kalman_filter(F, Q, H, R, m0, P0, np.zeros((0, 2)))
    with pytest.raises(ValueError):
        sp.kalman_filter(F[:2], Q, H, R, m0, P0, np.zeros((5, 2)))
    with pytest.raises(ValueError):
        sp.kalman_filter(F, Q, H[:, :2], R, m0, P0, np.zeros((5, 2)))


def test_kalman_obs_dim_validation():
    # review finding: d_obs mismatch gave a cryptic dot_general error
    F, Q, H, R, m0, P0 = _model()
    with pytest.raises(ValueError):
        sp.kalman_filter(F, Q, H, R, m0, P0, np.zeros((10, 3)))


def test_kalman_matmuls_are_highest_precision():
    """Round-5: same compounding-bf16 hazard class as the IIR scan (see
    test_iir.test_recurrence_scan_matmuls_are_highest_precision) — both
    kalman paths must lower every dot_general at HIGHEST."""
    import re

    import jax

    F, Q, H, R, m0, P0 = _model()
    _, ys = _simulate(F, Q, H, R, m0, P0, 32)
    ys = ys.astype(np.float32)
    for par in (False, True):
        txt = jax.jit(
            lambda y: sp.kalman_filter(F, Q, H, R, m0, P0, y, parallel=par)
        ).lower(ys).as_text()
        dots = re.findall(r"dot_general.*", txt)
        assert dots
        bad = [d for d in dots if "HIGHEST" not in d]
        assert not bad, (par, len(bad), bad[0][:200])
