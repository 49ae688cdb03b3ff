"""Flagship spectral-filter model: forward, autodiff, training, distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_radix_fast_fourier_transform_tpu import models
from mixed_radix_fast_fourier_transform_tpu.parallel import make_mesh, shard_batch


class TestLocalModel:
    def test_identity_init_is_near_identity(self):
        params = models.init_params(jax.random.PRNGKey(0), 256)
        params["gain_re"] = jnp.ones_like(params["gain_re"])
        params["gain_im"] = jnp.zeros_like(params["gain_im"])
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
        y = models.apply(params, x)
        assert np.max(np.abs(np.asarray(y) - np.asarray(x))) < 1e-4

    def test_grads_flow_through_fft(self):
        params = models.init_params(jax.random.PRNGKey(0), 128)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 128))
        grads = jax.grad(models.loss_fn)(params, x, t)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.abs(grads["gain_re"]).sum()) > 0

    def test_training_reduces_loss(self):
        n = 64
        params = models.init_params(jax.random.PRNGKey(0), n)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, n))
        # target = low-pass filtered input: learnable by the per-bin gain
        spec = np.fft.rfft(np.asarray(x), axis=-1)
        spec[:, 10:] = 0
        t = jnp.asarray(np.fft.irfft(spec, n=n, axis=-1).astype(np.float32))
        step = jax.jit(models.train_step)
        _, loss0 = step(params, x, t)
        for _ in range(60):
            params, loss = step(params, x, t, 0.5)
        assert float(loss) < 0.5 * float(loss0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDistributedModel:
    @pytest.mark.slow
    def test_distributed_matches_local_filter(self):
        mesh = make_mesh((2, 4))
        n = 256
        params = models.init_params_complex(jax.random.PRNGKey(0), n)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, n))
        y = models.apply_distributed(params, shard_batch(x, mesh), mesh)
        # oracle: same filter with numpy ffts
        gain = np.asarray(params["gain_re"]) + 1j * np.asarray(params["gain_im"])
        want = np.fft.ifft(np.fft.fft(np.asarray(x), axis=-1) * gain, axis=-1).real
        assert np.max(np.abs(np.asarray(y) - want)) < 1e-4

    def test_distributed_train_step(self):
        mesh = make_mesh((2, 4))
        n = 64
        params = models.init_params_complex(jax.random.PRNGKey(0), n)
        x = shard_batch(jax.random.normal(jax.random.PRNGKey(1), (4, n)), mesh)
        t = shard_batch(jax.random.normal(jax.random.PRNGKey(2), (4, n)), mesh)
        step = jax.jit(
            lambda p, x, t: models.train_step_distributed(
                p, x, t, mesh, data_axis="data", seq_axis="seq", n1=8
            )
        )
        params2, loss = step(params, x, t)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(params2):
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestCheckpoint:
    def test_roundtrip_spectral_filter(self, tmp_path):
        from mixed_radix_fast_fourier_transform_tpu.models.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        params = models.init_params(jax.random.PRNGKey(0), 128)
        path = str(tmp_path / "ckpt.npz")
        n = save_checkpoint(path, params)
        assert n == 3
        restored = load_checkpoint(path, like=params)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_roundtrip_fno_nested(self, tmp_path):
        from mixed_radix_fast_fourier_transform_tpu.models import fno
        from mixed_radix_fast_fourier_transform_tpu.models.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        params = fno.init_fno(jax.random.PRNGKey(0), 2, 4, 1, n_layers=2, modes=4)
        path = str(tmp_path / "fno.npz")
        save_checkpoint(path, params)
        restored = load_checkpoint(path, like=params)
        assert isinstance(restored["layers"], list) and len(restored["layers"]) == 2
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 64))
        np.testing.assert_allclose(
            np.asarray(fno.apply(params, x)), np.asarray(fno.apply(restored, x)),
            rtol=1e-6,
        )

    def test_mismatch_raises(self, tmp_path):
        from mixed_radix_fast_fourier_transform_tpu.models.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        params = models.init_params(jax.random.PRNGKey(0), 64)
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, params)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            load_checkpoint(path, like={"different": np.zeros(3)})


class TestMetrics:
    def test_counters(self):
        from mixed_radix_fast_fourier_transform_tpu.plan import clear_plan_cache, get_plan
        from mixed_radix_fast_fourier_transform_tpu.utils.metrics import (
            get_metrics,
            reset_metrics,
        )

        clear_plan_cache()
        reset_metrics()
        get_plan(96, -1)
        get_plan(96, -1)
        m = get_metrics()
        assert m["plans_built"] == 1
        assert m["plan_cache_hits"] == 1
