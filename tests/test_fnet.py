"""FNet model family: Fourier token mixing, training, sequence parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mixed_radix_fast_fourier_transform_tpu.models import fnet
from mixed_radix_fast_fourier_transform_tpu.parallel import make_mesh


class TestFourierMix:
    def test_vs_numpy_2d_fft(self, rng):
        x = rng.standard_normal((3, 32, 16)).astype(np.float32)
        got = np.asarray(fnet.fourier_mix(jnp.asarray(x)))
        want = np.real(np.fft.fft(np.fft.fft(x.astype(np.float64), axis=-1), axis=-2))
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    def test_mix_is_parameter_free_linear(self, rng):
        # linearity: mix(a·x + b·y) == a·mix(x) + b·mix(y)
        x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
        lhs = fnet.fourier_mix(2.0 * x - 3.0 * y)
        rhs = 2.0 * fnet.fourier_mix(x) - 3.0 * fnet.fourier_mix(y)
        assert float(jnp.max(jnp.abs(lhs - rhs))) < 1e-3


class TestFNetLocal:
    def test_forward_shape_and_finite(self):
        params = fnet.init_fnet(jax.random.PRNGKey(0), 16, n_layers=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16))
        y = jax.jit(fnet.apply)(params, x)
        assert y.shape == (4, 32, 16)
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_grads_flow_through_both_ffts(self):
        params = fnet.init_fnet(jax.random.PRNGKey(0), 8, n_layers=1)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 8))
        grads = jax.grad(fnet.loss_fn)(params, x, t)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.abs(grads["layers"][0]["w1"]).sum()) > 0

    def test_training_reduces_loss(self):
        params = fnet.init_fnet(jax.random.PRNGKey(0), 8, n_layers=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 8))
        t = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8))
        step = jax.jit(fnet.train_step)
        params, l0 = step(params, x, t)
        loss = l0
        for _ in range(10):
            params, loss = step(params, x, t)
        assert float(loss) < float(l0)

    def test_mixed_radix_seq_length(self, rng):
        # non-power-of-two sequence length exercises the mixed-radix planner
        params = fnet.init_fnet(jax.random.PRNGKey(0), 8, n_layers=1)
        x = jnp.asarray(rng.standard_normal((2, 60, 8)).astype(np.float32))
        y = fnet.apply(params, x)
        assert y.shape == (2, 60, 8) and bool(jnp.all(jnp.isfinite(y)))


class TestFNetDistributed:
    def test_seq_parallel_matches_local(self, rng):
        mesh = make_mesh((2, 4))
        params = fnet.init_fnet(jax.random.PRNGKey(0), 16, n_layers=2)
        x = jnp.asarray(rng.standard_normal((4, 256, 16)).astype(np.float32))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
        got = jax.jit(
            lambda a: fnet.apply_distributed(params, a, mesh, n1=16)
        )(xs)
        want = fnet.apply(params, x)
        err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert err < 1e-4, err

    def test_distributed_train_step(self, rng):
        mesh = make_mesh((2, 4))
        params = fnet.init_fnet(jax.random.PRNGKey(0), 8, n_layers=1)
        sh = NamedSharding(mesh, P("data", "seq", None))
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32)), sh
        )
        t = jax.device_put(
            jnp.asarray(rng.standard_normal((4, 64, 8)).astype(np.float32)), sh
        )
        step = jax.jit(
            lambda p, a, b: fnet.train_step_distributed(p, a, b, mesh, n1=8)
        )
        params, l0 = step(params, x, t)
        params, l1 = step(params, x, t)
        assert np.isfinite(float(l0)) and float(l1) <= float(l0) + 1e-6
