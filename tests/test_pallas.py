"""Fused Pallas kernel (ops/pallas_fft.py), interpreter mode on CPU."""

import dataclasses

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.ops.pallas_fft import (
    exec_pallas,
    pallas_factors,
    stage_twiddles,
    supports,
)
from mixed_radix_fast_fourier_transform_tpu.utils.config import DEFAULT_CONFIG


class TestFactors:
    def test_pow2_prefers_8_4(self):
        assert pallas_factors(1024) == (8, 8, 4, 4)
        assert pallas_factors(64) == (8, 8)
        assert pallas_factors(2) == (2,)

    def test_mixed(self):
        facs = pallas_factors(5040)
        assert int(np.prod(facs)) == 5040
        assert all(f <= 8 for f in facs)

    def test_large_prime_rejected(self):
        with pytest.raises(ValueError):
            pallas_factors(11 * 4)
        assert not supports(44, 1)
        assert supports(360, 1)

    def test_vmem_cap(self):
        assert not supports(65536, 1)


class TestKernel:
    @pytest.mark.parametrize("n", [8, 64, 360, 1024])
    def test_forward_matches_numpy(self, rng, n):
        x = rng.standard_normal((5, n)) + 1j * rng.standard_normal((5, n))
        zr, zi = exec_pallas(
            x.real.astype(np.float32), x.imag.astype(np.float32), n, -1,
            interpret=True,
        )
        got = np.asarray(zr) + 1j * np.asarray(zi)
        want = np.fft.fft(x, axis=-1)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_inverse_unnormalized(self, rng):
        n = 256
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        zr, zi = exec_pallas(
            x.real.astype(np.float32), x.imag.astype(np.float32), n, 1,
            interpret=True,
        )
        got = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        want = np.fft.ifft(x, axis=-1)
        assert np.max(np.abs(got - want)) < 1e-5

    def test_batch_not_multiple_of_tile(self, rng):
        # batch 3 -> padded to 128 internally, result cropped
        x = rng.standard_normal((3, 64)) + 1j * rng.standard_normal((3, 64))
        zr, zi = exec_pallas(
            x.real.astype(np.float32), x.imag.astype(np.float32), 64, -1,
            interpret=True,
        )
        assert zr.shape == (3, 64)

    def test_twiddle_layout(self):
        tws = stage_twiddles((4, 4), -1)
        assert len(tws) == 1  # only the second stage has l > 1
        assert tws[0][0].shape == (4, 4)


class TestDispatch:
    def test_config_flag_routes_through_pallas(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, use_pallas=True)
        x = (rng.standard_normal(360) + 1j * rng.standard_normal(360)).astype(
            np.complex64
        )
        got = np.asarray(sp.fft(x, config=cfg))
        want = np.fft.fft(x)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_unsupported_length_falls_back(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, use_pallas=True)
        x = (rng.standard_normal(44) + 1j * rng.standard_normal(44)).astype(
            np.complex64
        )  # 44 = 4*11: prime 11 > 7 -> XLA path
        got = np.asarray(sp.fft(x, config=cfg))
        want = np.fft.fft(x)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


class TestRfftDispatch:
    def test_rfft_through_pallas(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, use_pallas=True)
        x = rng.standard_normal(720).astype(np.float32)  # h=360: 2/3/5-smooth
        got = np.asarray(sp.rfft(x, config=cfg))
        want = np.fft.rfft(x.astype(np.float64))
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5

    def test_irfft_through_pallas(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, use_pallas=True)
        x = rng.standard_normal(512).astype(np.float32)
        back = np.asarray(sp.irfft(sp.rfft(x, config=cfg), n=512, config=cfg))
        assert np.max(np.abs(back - x)) < 1e-4


class TestAutoMode:
    def test_auto_uses_xla_on_cpu(self, rng):
        # use_pallas=None -> auto: off-TPU backends take the XLA path, same result
        cfg = dataclasses.replace(DEFAULT_CONFIG, use_pallas=None)
        x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(
            np.complex64
        )
        got = np.asarray(sp.fft(x, config=cfg))
        want = np.fft.fft(x)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5
