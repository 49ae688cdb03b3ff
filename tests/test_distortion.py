"""Distortion/purity metrics: synthesized-signal oracles with known levels."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _tone(n, f, amp=1.0, phase=0.3):
    return amp * np.sin(2 * np.pi * f * np.arange(n) + phase)


def test_thd_known_harmonic_level():
    n = 16384
    f0 = 1000 / 16384  # exact bin
    x = _tone(n, f0) + 0.01 * _tone(n, 2 * f0, phase=1.1)  # −40 dBc H2
    got = sp.thd(x)
    assert abs(got - (-40.0)) < 0.5, got


def test_thd_multiple_harmonics():
    n = 16384
    f0 = 700 / n
    x = (_tone(n, f0) + 0.01 * _tone(n, 2 * f0) + 0.01 * _tone(n, 3 * f0))
    want = 10 * np.log10(2 * 0.01 ** 2 / 2 / 0.5)  # two −40 dBc harmonics
    assert abs(sp.thd(x) - want) < 0.5


def test_sinad_and_enob_vs_noise_floor(rng):
    n = 65536
    x = _tone(n, 1234 / n) + 1e-3 * rng.standard_normal(n)
    # SNR = 10 log10(0.5 / 1e-6) ≈ 57 dB
    got = sp.sinad(x, nperseg=16384)
    assert abs(got - 57.0) < 1.0, got
    assert abs(sp.enob(x, nperseg=16384) - (57.0 - 1.76) / 6.02) < 0.2


def test_sfdr_spur():
    n = 16384
    x = _tone(n, 800 / n) + 3e-4 * _tone(n, 2605 / n)  # −70.5 dBc spur
    got = sp.sfdr(x)
    assert abs(got - 70.5) < 1.0, got


def test_clean_tone_is_very_pure():
    n = 8192
    x = _tone(n, 512 / n)
    assert sp.thd(x) < -100
    assert sp.sfdr(x) > 100


def test_distortion_validation(rng):
    with pytest.raises(ValueError):
        sp.thd(rng.standard_normal((2, 64)))
    with pytest.raises(ValueError):
        sp.sinad(rng.standard_normal(64), nperseg=8)
