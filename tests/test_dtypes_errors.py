"""Dtype matrix (fp32 default, bf16 opt-in) and error paths.

SURVEY.md §7 phase E: dtype studies and error-budget checks; reference error
handling is fprintf+exit (src/highSpeedFFT.c:320-324) — here every invalid
input raises a typed Python exception."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.utils.config import DEFAULT_CONFIG


class TestBf16:
    def test_fft_bf16_tolerance(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, dtype=jnp.bfloat16)
        n = 256
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        got = np.asarray(sp.fft(x, config=cfg)).astype(np.complex128)
        want = np.fft.fft(x.astype(np.complex128))
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        # bf16 has an 8-bit mantissa: expect ~1e-2 class accuracy, no worse
        assert rel < 5e-2

    def test_rfft_bf16_roundtrip(self, rng):
        cfg = dataclasses.replace(DEFAULT_CONFIG, dtype=jnp.bfloat16)
        x = rng.standard_normal(128).astype(np.float32)
        back = np.asarray(sp.irfft(sp.rfft(x, config=cfg), n=128, config=cfg))
        assert np.max(np.abs(back - x)) < 0.2


class TestDtypePreservation:
    def test_complex64_in_out(self, rng):
        x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
            np.complex64
        )
        assert sp.fft(x).dtype == jnp.complex64
        assert sp.ifft(x).dtype == jnp.complex64

    def test_rfft_real_out(self, rng):
        x = rng.standard_normal(64).astype(np.float32)
        spec = sp.rfft(x)
        assert jnp.issubdtype(spec.dtype, jnp.complexfloating)
        assert sp.irfft(spec, n=64).dtype == jnp.float32


class TestErrorPaths:
    def test_zero_length(self):
        with pytest.raises(ValueError):
            sp.fft(np.zeros(4, np.complex64), n=0)

    def test_scalar_input(self):
        with pytest.raises(ValueError):
            sp.fft(np.float32(3.0))

    def test_bad_norm(self):
        with pytest.raises(ValueError):
            sp.fft(np.zeros(8, np.complex64), norm="weird")

    def test_bad_sign_plan(self):
        from mixed_radix_fast_fourier_transform_tpu.plan import build_complex_plan

        with pytest.raises(ValueError):
            build_complex_plan(8, 2)
        with pytest.raises(ValueError):
            build_complex_plan(0, -1)

    def test_real_plan_odd_raises(self):
        from mixed_radix_fast_fourier_transform_tpu.plan import build_real_plan

        with pytest.raises(ValueError):
            build_real_plan(15, -1)

    def test_rfft_odd_length_works_via_fallback(self, rng):
        # public op layer falls back to full complex transform for odd n
        x = rng.standard_normal(15).astype(np.float32)
        got = np.asarray(sp.rfft(x))
        want = np.fft.rfft(x.astype(np.float64))
        assert got.shape == (8,)
        assert np.max(np.abs(got - want)) < 1e-4

    def test_convolve_empty_raises(self):
        with pytest.raises((ValueError, TypeError)):
            sp.fft_convolve(np.zeros(0, np.float32), np.ones(3, np.float32))

    def test_mismatched_axes_fftn(self, rng):
        x = rng.standard_normal((4, 4)).astype(np.float32)
        with pytest.raises(ValueError):
            sp.fftn(x, s=(4, 4, 4), axes=(0, 1))

    def test_unknown_plan_kind(self):
        with pytest.raises(ValueError):
            sp.get_plan(8, -1, "quaternion")


class TestConfigValidation:
    def test_bad_pad_mode(self):
        import dataclasses

        with pytest.raises(ValueError):
            dataclasses.replace(DEFAULT_CONFIG, pad_mode="weird")

    def test_bad_strategy(self):
        import dataclasses

        with pytest.raises(ValueError):
            dataclasses.replace(DEFAULT_CONFIG, stage_strategy="chaotic")

    def test_bad_max_stage(self):
        import dataclasses

        with pytest.raises(ValueError):
            dataclasses.replace(DEFAULT_CONFIG, max_stage=1)


def test_engine_only_precision_schemes_work_everywhere():
    """SpectralConfig(precision='split6' | per-stage tuple) must not crash
    (or silently change semantics in) ops outside the stage-matmul engine —
    they resolve via config.op_precision (round-3 review finding)."""
    import dataclasses

    import numpy as np

    import mixed_radix_fast_fourier_transform_tpu as sp
    from mixed_radix_fast_fourier_transform_tpu.utils.config import DEFAULT_CONFIG

    rng = np.random.default_rng(0)
    for prec in ("split6", ("highest", "high"), ("highest", "high", "high")):
        cfg = dataclasses.replace(DEFAULT_CONFIG, precision=prec)
        assert cfg.op_precision == "highest"
        x = rng.standard_normal(64).astype(np.float32)
        np.asarray(sp.fft(x, config=cfg))
        np.asarray(sp.dwt(x, "db2", config=cfg)[0])
        f = rng.standard_normal((8, 16)).astype(np.float32)
        np.asarray(sp.sht(f, config=cfg))
        pts = rng.uniform(0, 2 * np.pi, 32).astype(np.float32)
        c = (rng.standard_normal(32) + 0j).astype(np.complex64)
        np.asarray(sp.nufft1(pts, c, 16, config=cfg))


def test_bf16_working_dtype():
    """SpectralConfig(dtype=bfloat16) runs end-to-end; error is the bf16
    representation floor (~4e-3) — the ML-pipeline working-dtype mode."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    import mixed_radix_fast_fourier_transform_tpu as sp
    from mixed_radix_fast_fourier_transform_tpu.utils.config import DEFAULT_CONFIG

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 256)) + 1j * rng.standard_normal((2, 256)))
    cfg = dataclasses.replace(DEFAULT_CONFIG, dtype=jnp.bfloat16)
    got = np.asarray(sp.fft(x.astype(np.complex64), config=cfg)).astype(complex)
    want = np.fft.fft(x)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 2e-2, rel
    back = np.asarray(sp.irfft(
        sp.rfft(x.real.astype(np.float32), config=cfg), n=256, config=cfg
    ))
    assert np.max(np.abs(back - x.real)) / np.max(np.abs(x.real)) < 5e-2
