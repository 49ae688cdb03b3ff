"""Variational mode decomposition: separation + center-frequency oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_vmd_two_tone_separation(rng):
    k = np.arange(2048)
    t1 = np.cos(2 * np.pi * 0.05 * k)
    t2 = 0.7 * np.cos(2 * np.pi * 0.15 * k + 1.0)
    x = (t1 + t2 + 0.02 * rng.standard_normal(2048)).astype(np.float32)
    modes, omega = sp.vmd(x, K=2, alpha=2000.0)
    modes, omega = np.asarray(modes), np.asarray(omega)
    np.testing.assert_allclose(omega, [0.05, 0.15], atol=2e-3)
    sl = slice(128, -128)
    assert _corr(modes[0][sl], t1[sl]) > 0.99
    assert _corr(modes[1][sl], t2[sl]) > 0.99
    # near-exact reconstruction of the clean part
    recon = modes.sum(axis=0)
    assert np.mean((recon[sl] - (t1 + t2)[sl]) ** 2) < 5e-3


def test_vmd_separates_crossing_chirp_from_tone(rng):
    k = np.arange(4096)
    tone = np.cos(2 * np.pi * 0.05 * k)
    am = (1 + 0.3 * np.cos(2 * np.pi * 0.002 * k)) * np.cos(
        2 * np.pi * 0.2 * k)
    x = (tone + am).astype(np.float32)
    modes, omega = sp.vmd(x, K=2, alpha=500.0)
    omega = np.asarray(omega)
    assert abs(omega[0] - 0.05) < 5e-3
    assert abs(omega[1] - 0.2) < 5e-3


def test_vmd_batched_and_validation(rng):
    x = rng.standard_normal((3, 512)).astype(np.float32)
    modes, omega = sp.vmd(x, K=3, n_iter=60)
    assert np.asarray(modes).shape == (3, 3, 512)
    assert np.asarray(omega).shape == (3, 3)
    assert np.all(np.diff(np.asarray(omega), axis=-1) >= -1e-6)  # sorted
    with pytest.raises(ValueError):
        sp.vmd(x, K=0)
    with pytest.raises(ValueError):
        sp.vmd(np.zeros(4, np.float32), K=2)
    with pytest.raises(ValueError):
        sp.vmd(x, K=2, init_omega=np.zeros(3))


def test_vmd_jits(rng):
    # Structured two-tone input, NOT pure noise: the default greedy
    # spectral-peak init is data-dependent, and on noise the argmax bin can
    # flip between jit and eager under XLA thread-count fp variation,
    # diverging the whole decomposition (round-5 lane flake).  With clean,
    # well-separated peaks the init is stable and the comparison is
    # fp-level.
    import jax

    k = np.arange(1024)
    x = (np.cos(2 * np.pi * 0.07 * k) + 0.6 * np.cos(2 * np.pi * 0.23 * k)
         + 0.01 * rng.standard_normal(1024)).astype(np.float32)
    fn = jax.jit(lambda v: sp.vmd(v, K=2, n_iter=50))
    m1, o1 = fn(x)
    m2, o2 = sp.vmd(x, K=2, n_iter=50)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


def test_vmd_review_regressions(rng):
    k = np.arange(1024)
    # DC must not double (review finding)
    x = (3.0 + np.cos(2 * np.pi * 0.1 * k)).astype(np.float32)
    modes, _ = sp.vmd(x, K=2, alpha=50.0)
    recon = np.asarray(modes).sum(axis=0)
    assert abs(recon.mean() - 3.0) < 0.05, recon.mean()
    # Nyquist content is recoverable (review finding)
    y = ((-1.0) ** k + 0.5 * np.cos(2 * np.pi * 0.1 * k)).astype(np.float32)
    m2, om = sp.vmd(y, K=2, alpha=50.0)
    r2 = np.asarray(m2).sum(axis=0)
    assert np.max(np.abs(r2[64:-64] - y[64:-64])) < 0.1
    # complex input is rejected, not silently truncated (review finding)
    with pytest.raises(ValueError):
        sp.vmd(np.zeros(64, np.complex64), K=2)


def test_vmd_peak_init_recovers_orphaned_tone():
    """Round-5 regression (bench vmd_k3_n4096): three tones at
    0.05/0.15/0.31 — the uniform init grid (0.083, 0.25, 0.417) sends BOTH
    upper modes to 0.31 and orphans 0.15 (max omega err 0.16); the default
    greedy spectral-peak init recovers all three to ~3e-5."""
    n = 2048
    k = np.arange(n)
    truth = np.array([0.05, 0.15, 0.31])
    rng = np.random.default_rng(0)
    x = sum(np.cos(2 * np.pi * f * k + i) for i, f in enumerate(truth))
    x = (x + 0.02 * rng.standard_normal(n)).astype(np.float32)
    _, om = sp.vmd(x, K=3, n_iter=120)
    np.testing.assert_allclose(np.sort(np.asarray(om)), truth, atol=1e-3)
    # the uniform grid is still available and still fails this signal
    _, omu = sp.vmd(x, K=3, n_iter=120, init_omega="uniform")
    assert np.max(np.abs(np.sort(np.asarray(omu)) - truth)) > 0.05
    with pytest.raises(ValueError):
        sp.vmd(x, K=3, init_omega="bogus")


def test_vmd_peak_init_batched(rng):
    """Peak init is per batch element: two signals with different tone
    pairs each seed at their own peaks."""
    k = np.arange(2048)
    x1 = np.cos(2 * np.pi * 0.07 * k) + 0.6 * np.cos(2 * np.pi * 0.33 * k)
    x2 = np.cos(2 * np.pi * 0.12 * k) + 0.6 * np.cos(2 * np.pi * 0.41 * k)
    x = np.stack([x1, x2]).astype(np.float32)
    x += 0.01 * rng.standard_normal(x.shape).astype(np.float32)
    _, om = sp.vmd(x, K=2, n_iter=120)
    om = np.sort(np.asarray(om), axis=-1)
    np.testing.assert_allclose(om[0], [0.07, 0.33], atol=2e-3)
    np.testing.assert_allclose(om[1], [0.12, 0.41], atol=2e-3)
