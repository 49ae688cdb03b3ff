"""FNO model family: shapes, autodiff, learning."""

import jax
import jax.numpy as jnp
import numpy as np

from mixed_radix_fast_fourier_transform_tpu.models import fno


class TestFNO:
    def test_forward_shape(self):
        params = fno.init_fno(jax.random.PRNGKey(0), 2, 8, 3, n_layers=2, modes=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 128))
        y = fno.apply(params, x)
        assert y.shape == (4, 3, 128)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_grads_finite(self):
        params = fno.init_fno(jax.random.PRNGKey(0), 1, 4, 1, n_layers=1, modes=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 64))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64))
        grads = jax.grad(fno.loss_fn)(params, x, t)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_learns_identity(self):
        # target = input; a 1-layer FNO should reduce loss quickly
        params = fno.init_fno(jax.random.PRNGKey(0), 1, 8, 1, n_layers=1, modes=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 64))
        step = jax.jit(fno.train_step)
        _, loss0 = step(params, x, x)
        for _ in range(50):
            params, loss = step(params, x, x, 3e-2)
        assert float(loss) < 0.7 * float(loss0)

    def test_mixed_radix_length(self):
        # n = 360: exercises the 2/3/5 mixed-radix path inside the model
        params = fno.init_fno(jax.random.PRNGKey(0), 1, 4, 1, n_layers=1, modes=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 360))
        y = fno.apply(params, x)
        assert y.shape == (2, 1, 360)
