"""S4D state-space model family: kernel/recurrence duality + training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixed_radix_fast_fourier_transform_tpu.models import s4d


@pytest.fixture(scope="module")
def layer():
    return s4d.init_s4d_layer(jax.random.PRNGKey(0), hidden=4, state=8)


class TestS4DLayer:
    def test_kernel_decays(self, layer):
        # Re(A) < 0 by construction — the kernel must decay, not blow up
        k = np.asarray(s4d.s4d_kernel(layer, 256))
        assert k.shape == (4, 256)
        assert np.all(np.isfinite(k))
        assert np.max(np.abs(k[:, -16:])) < np.max(np.abs(k[:, :16]))

    def test_conv_matches_recurrence(self, layer, rng):
        # the FFT long-convolution and the streaming recurrence are the
        # same operator — the library's headline duality
        B, L, H, N2 = 2, 96, 4, 4
        u = rng.standard_normal((B, L, H)).astype(np.float32)
        y_conv = np.asarray(s4d.s4d_conv(layer, jnp.asarray(u)))

        def scan_fn(carry, ut):
            (s_re, s_im), y = s4d.s4d_step(layer, carry[0], carry[1], ut)
            return (s_re, s_im), y

        s0 = (jnp.zeros((B, H, N2), jnp.float32),
              jnp.zeros((B, H, N2), jnp.float32))
        _, y_rec = jax.lax.scan(scan_fn, s0, jnp.moveaxis(jnp.asarray(u), 1, 0))
        y_rec = np.asarray(jnp.moveaxis(y_rec, 0, 1))
        err = np.max(np.abs(y_conv - y_rec)) / max(1.0, np.max(np.abs(y_rec)))
        assert err < 1e-4

    def test_causality(self, layer, rng):
        # output at time t must not depend on inputs after t
        u = rng.standard_normal((1, 64, 4)).astype(np.float32)
        u2 = u.copy()
        u2[:, 40:] += 1.0
        y1 = np.asarray(s4d.s4d_conv(layer, jnp.asarray(u)))
        y2 = np.asarray(s4d.s4d_conv(layer, jnp.asarray(u2)))
        assert np.max(np.abs(y1[:, :40] - y2[:, :40])) < 1e-5
        assert np.max(np.abs(y1[:, 40:] - y2[:, 40:])) > 1e-3

    def test_odd_state_rejected(self):
        with pytest.raises(ValueError):
            s4d.init_s4d_layer(jax.random.PRNGKey(0), hidden=4, state=7)


class TestS4DModel:
    def test_shapes_and_jit(self, rng):
        params = s4d.init_s4d_model(jax.random.PRNGKey(1), hidden=8,
                                    n_layers=2, state=8, in_dim=3, out_dim=5)
        u = rng.standard_normal((2, 64, 3)).astype(np.float32)
        out = jax.jit(lambda p, v: s4d.apply_s4d(p, v))(params, jnp.asarray(u))
        assert out.shape == (2, 5)
        seq = jax.jit(lambda p, v: s4d.apply_s4d(p, v, pool=False))(
            params, jnp.asarray(u))
        assert seq.shape == (2, 64, 5)

    def test_training_reduces_loss(self, rng):
        # learn a delayed-echo task: target[t] = u[t-8]
        params = s4d.init_s4d_model(jax.random.PRNGKey(2), hidden=8,
                                    n_layers=1, state=16, in_dim=1, out_dim=1)
        u = rng.standard_normal((4, 128, 1)).astype(np.float32)
        tgt = np.roll(u, 8, axis=1)
        tgt[:, :8] = 0.0
        step = jax.jit(lambda p, a, b: s4d.train_step(p, a, b, lr=2e-2))
        ua, ta = jnp.asarray(u), jnp.asarray(tgt)
        _, loss0 = step(params, ua, ta)
        for _ in range(30):
            params, loss = step(params, ua, ta)
        assert float(loss) < 0.7 * float(loss0)
        assert np.isfinite(float(loss))
