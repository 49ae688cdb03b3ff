"""Wigner-Ville: chirp IF tracking, time marginal, tone localization,
batch/jit, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def test_chirp_instantaneous_frequency(rng):
    fs, T = 1000.0, 1024
    t = np.arange(T) / fs
    f0, f1 = 50.0, 200.0
    rate = (f1 - f0) / t[-1]
    sig = np.cos(2 * np.pi * (f0 * t + 0.5 * rate * t * t)).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=129, hop=8))
    errs = []
    for i in range(4, W.shape[0] - 4):
        f_inst = f0 + rate * t[i * 8]
        k = int(np.argmax(W[i][: 129 // 2]))
        errs.append(abs(k * fs / (2 * 129) - f_inst))
    assert np.median(errs) < fs / (2 * 129)  # sub-bin IF tracking


def test_time_marginal_is_instantaneous_power(rng):
    sig = rng.standard_normal(512).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=65, hop=4))
    z = np.asarray(sp.hilbert(sig))
    marg = W.sum(-1) / 65
    want = np.abs(z[::4]) ** 2
    sl = slice(10, -10)
    assert np.abs(marg[sl] - want[sl]).max() / want.max() < 1e-5


def test_tone_concentrates_at_its_bin(rng):
    fs, T = 800.0, 512
    f_tone = 100.0
    sig = np.cos(2 * np.pi * f_tone * np.arange(T) / fs).astype(np.float32)
    W = np.asarray(sp.wigner_ville(sig, nperseg=129, hop=16))
    mid = W[W.shape[0] // 2]
    k = int(np.argmax(mid[: 129 // 2]))
    assert abs(k * fs / (2 * 129) - f_tone) < fs / 129


def test_batch_jit(rng):
    import jax

    x = rng.standard_normal((2, 256)).astype(np.float32)
    W = np.asarray(jax.jit(
        lambda v: sp.wigner_ville(v, nperseg=33, hop=8)
    )(x))
    assert W.shape[:1] == (2,)
    single = np.asarray(sp.wigner_ville(x[1], nperseg=33, hop=8))
    scale = max(1.0, float(np.abs(single).max()))
    assert np.abs(W[1] - single).max() / scale < 1e-5


def test_errors(rng):
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(2, np.float32))
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=32)  # even
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=129)  # > T
    with pytest.raises(ValueError):
        sp.wigner_ville(np.ones(64, np.float32), nperseg=33, hop=0)
