"""Koopman autoencoder: trains to forecast a nonlinear system."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_radix_fast_fourier_transform_tpu.models import (
    init_koopman, koopman_encode, koopman_loss, koopman_rollout,
    koopman_spectrum,
)


def _duffing_trajs(rng, n_traj=24, T=40, dt=0.1):
    """Weakly nonlinear oscillator x'' = -x - 0.4 x^3 - 0.1 x' (RK-free
    semi-implicit Euler is fine at this dt for test data)."""
    trajs = np.zeros((n_traj, T, 2))
    for i in range(n_traj):
        x, v = rng.uniform(-1, 1, 2)
        for t in range(T):
            a = -x - 0.4 * x**3 - 0.1 * v
            v = v + dt * a
            x = x + dt * v
            trajs[i, t] = (x, v)
    return trajs.astype(np.float32)


@pytest.mark.slow  # 300-step Adam optimization loop (lane rule)
def test_koopman_trains_and_forecasts(rng):
    import optax

    trajs = _duffing_trajs(rng)
    params = init_koopman(jax.random.PRNGKey(0), state_dim=2,
                          latent_dim=12, hidden=48)
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(koopman_loss)(p, trajs, horizon=6)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    l0 = float(koopman_loss(params, trajs, horizon=6))
    for _ in range(300):
        params, state, l = step(params, state)
    assert float(l) < 0.05 * l0, (l0, float(l))

    # multi-step forecast from held-out initial conditions
    test = _duffing_trajs(np.random.default_rng(99), n_traj=4)
    pred = np.asarray(koopman_rollout(params, jnp.asarray(test[:, 0]), 20))
    pred = np.swapaxes(pred, 0, 1)  # (traj, step, state)
    mse = np.mean((pred[:, 1:21] - test[:, 1:21]) ** 2)
    # baseline: persistence (x_t = x_0)
    base = np.mean((test[:, 0][:, None] - test[:, 1:21]) ** 2)
    assert mse < 0.3 * base, (mse, base)


def test_koopman_shapes_and_spectrum():
    params = init_koopman(jax.random.PRNGKey(1), state_dim=3, latent_dim=8)
    x = jnp.ones((5, 3))
    z = koopman_encode(params, x)
    assert z.shape == (5, 8)
    roll = koopman_rollout(params, x, 4)
    assert roll.shape == (5, 5, 3)
    eigs, omega = koopman_spectrum(params)
    assert eigs.shape == (8,)
    np.testing.assert_allclose(np.abs(eigs), 0.99, atol=1e-5)  # init

    with pytest.raises(ValueError):
        koopman_loss(params, jnp.ones((2, 4, 3)), horizon=6)
    with pytest.raises(ValueError):
        koopman_rollout(params, x, -1)
