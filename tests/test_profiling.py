"""Roofline cost model + timing utilities."""

import jax.numpy as jnp
import numpy as np

from mixed_radix_fast_fourier_transform_tpu.plan import get_plan
from mixed_radix_fast_fourier_transform_tpu.utils.profiling import (
    marginal_time,
    plan_cost,
    roofline_summary,
    trace,
)


class TestPlanCost:
    def test_mixed_radix_model(self):
        plan = get_plan(1024, -1, "complex")
        cost = plan_cost(plan)
        assert cost.n == 1024
        assert cost.fft_model_flops == 5 * 1024 * 10
        # stages (64, 16): flops = 8*1024*(64+16) + 6*1024 (one twiddle pass)
        assert cost.flops == 8 * 1024 * sum(plan.factors) + 6 * 1024 * (
            len(plan.factors) - 1
        )
        assert cost.arithmetic_intensity > 1.0

    def test_bluestein_model(self):
        # 10007 stays Bluestein (10006 = 2·5003 is not stage-smooth)
        plan = get_plan(10007, -1, "complex")
        cost = plan_cost(plan)
        assert cost.n == 10007
        inner = plan_cost(plan.inner)
        assert cost.flops > 2 * inner.flops

    def test_real_model(self):
        plan = get_plan(4096, -1, "real")
        cost = plan_cost(plan)
        assert cost.n == 4096
        assert cost.fft_model_flops == 2.5 * 4096 * 12


class TestTiming:
    def test_marginal_time_positive(self):
        x = jnp.ones((8, 128), jnp.float32)
        t = marginal_time(lambda a: (a * 2.0,), (x,), short=5, long=25, reps=1)
        assert 0 < t < 1.0

    def test_roofline_summary_keys(self):
        plan = get_plan(256, -1, "complex")
        s = roofline_summary(plan, 1e-5, 64)
        assert set(s) >= {"gflops_fft_model", "hbm_gbps_lower_bound", "seconds"}
        assert s["gflops_fft_model"] > 0

    def test_trace_noop_tolerant(self, tmp_path):
        with trace(str(tmp_path)):
            _ = jnp.sum(jnp.ones(8))


class TestPlanPersistence:
    def test_manifest_roundtrip(self, tmp_path):
        from mixed_radix_fast_fourier_transform_tpu.plan import clear_plan_cache, get_plan
        from mixed_radix_fast_fourier_transform_tpu.utils.cache import (
            load_plans,
            save_plans,
            warm_plans,
        )

        clear_plan_cache()
        n_built = warm_plans([64, 360], kinds=("complex", "real"))
        assert n_built == 8
        path = str(tmp_path / "plans.npz")
        n_saved = save_plans(path)
        assert n_saved >= 8
        clear_plan_cache()
        assert load_plans(path) == n_saved


def test_estimate_four_step_hbm_config5():
    """BASELINE config 5 (65536-pt, batch 4096, v5e-8) fits HBM with margin."""
    from mixed_radix_fast_fourier_transform_tpu.utils.profiling import (
        estimate_four_step_hbm,
    )

    b = estimate_four_step_hbm(65536, 4096, 8)
    assert b["per_copy_bytes"] == 4096 * 8192 * 2 * 4  # 256 MiB
    assert b["fits_v5e_16gb"]
    assert 1.0 < b["total_gb"] < 4.0
    # and a shape that should NOT fit flags false
    big = estimate_four_step_hbm(1 << 22, 65536, 8)
    assert not big["fits_v5e_16gb"]
