"""FNO model family: shapes, autodiff, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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

    @pytest.mark.slow
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


class TestFNO2D:
    def test_forward_shape(self):
        params = fno.init_fno2d(jax.random.PRNGKey(0), 2, 6, 3, n_layers=2, modes=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 32, 32))
        y = fno.apply2d(params, x)
        assert y.shape == (2, 3, 32, 32)
        assert np.all(np.isfinite(np.asarray(y)))

    @pytest.mark.slow
    def test_grads_finite(self):
        params = fno.init_fno2d(jax.random.PRNGKey(0), 1, 4, 1, n_layers=1, modes=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16))
        grads = jax.grad(fno.loss_fn2d)(params, x, t)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_negative_h_modes_mixed(self):
        # The conjugate (negative-H) corner must be learnable: its tensor r2
        # receives gradient, and perturbing r2 changes the output.
        params = fno.init_fno2d(jax.random.PRNGKey(0), 1, 4, 1, n_layers=1, modes=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16))
        grads = jax.grad(fno.loss_fn2d)(params, x, t)
        g2 = np.asarray(grads["layers"][0]["r2_re"])
        assert np.max(np.abs(g2)) > 0
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    @pytest.mark.slow
    def test_learns_smoothing(self):
        # target = low-pass of input: expressible by the spectral mix
        n = 16
        params = fno.init_fno2d(jax.random.PRNGKey(0), 1, 6, 1, n_layers=1, modes=6)
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (8, 1, n, n)))
        spec = np.fft.rfft2(x, axes=(-2, -1))
        spec[..., 4:, :] = 0
        spec[..., :, 4:] = 0
        t = jnp.asarray(np.fft.irfft2(spec, s=(n, n), axes=(-2, -1)).astype(np.float32))
        xj = jnp.asarray(x.astype(np.float32))
        import optax

        opt = optax.adam(5e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, x_, y_):
            l, g = jax.value_and_grad(fno.loss_fn2d)(p, x_, y_)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        _, _, loss0 = step(params, opt_state, xj, t)
        for _ in range(150):
            params, opt_state, loss = step(params, opt_state, xj, t)
        assert float(loss) < 0.05 * float(loss0)


class TestFNO3D:
    def test_forward_shape(self):
        params = fno.init_fno3d(jax.random.PRNGKey(0), 2, 4, 3, n_layers=1, modes=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 8, 8, 8))
        y = fno.apply3d(params, x)
        assert y.shape == (2, 3, 8, 8, 8)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_all_corners_learn(self):
        # every corner tensor receives gradient and all leaves are finite
        params = fno.init_fno3d(jax.random.PRNGKey(0), 1, 3, 1, n_layers=1, modes=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 8, 8))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 8, 8))
        grads = jax.grad(fno.loss_fn3d)(params, x, t)
        for i in range(4):
            g = np.asarray(grads["layers"][0][f"r{i}_re"])
            assert np.max(np.abs(g)) > 0, i
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_train_step_reduces_loss(self):
        params = fno.init_fno3d(jax.random.PRNGKey(0), 1, 3, 1, n_layers=1, modes=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 8, 8, 8))
        step = jax.jit(fno.train_step3d)
        _, loss0 = step(params, x, x)
        p = params
        for _ in range(10):
            p, loss = step(p, x, x, 1e-2)
        assert float(loss) < float(loss0)

    def test_modes_too_large_raises(self):
        params = fno.init_fno3d(jax.random.PRNGKey(0), 1, 3, 1, n_layers=1, modes=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8, 8, 8))
        with pytest.raises(ValueError):
            fno.apply3d(params, x)
