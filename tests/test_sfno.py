"""Spherical FNO: shapes, training, and SO(3) (azimuthal) equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_radix_fast_fourier_transform_tpu.models import sfno


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_shapes_and_jit(rng):
    lmax = 7
    L = lmax + 1
    params = sfno.init_sfno(jax.random.PRNGKey(0), 2, 6, 3, lmax)
    x = jnp.asarray(rng.standard_normal((4, 2, L, 2 * L)).astype(np.float32))
    y = jax.jit(sfno.apply)(params, x)
    assert y.shape == (4, 3, L, 2 * L)
    assert bool(np.isfinite(np.asarray(y)).all())


def test_training_reduces_loss(rng):
    import mixed_radix_fast_fourier_transform_tpu as sp

    lmax = 5
    L = lmax + 1
    params = sfno.init_sfno(jax.random.PRNGKey(1), 1, 4, 1, lmax, n_layers=1)
    x = jnp.asarray(rng.standard_normal((8, 1, L, 2 * L)).astype(np.float32))
    # zonal (per-degree) smoothing IS in the SFNO hypothesis class (R
    # depends on l only); a fixed rotation would NOT be (it acts as a
    # Wigner-D inside each irrep, not a scalar)
    bl = np.exp(-0.1 * np.arange(L) * (np.arange(L) + 1)).astype(np.float32)
    target = sp.sphere_convolve(x, jnp.asarray(bl))
    step = jax.jit(sfno.train_step)
    params, l0 = step(params, x, target, 3e-2)
    for _ in range(60):
        params, loss = step(params, x, target, 3e-2)
    assert float(loss) < float(l0) * 0.75, (float(l0), float(loss))


@pytest.mark.slow  # lane budget: equivariance is the deep check; shapes +
# training (which differentiates the same path) stay in the default lane
def test_azimuthal_equivariance(rng):
    """Rolling the longitude axis by k cells is an exact rotation of the
    grid; the spectral path (R depends on l only) and pointwise ops commute
    with it, so apply(rot(x)) == rot(apply(x))."""
    lmax = 9
    L = lmax + 1
    params = sfno.init_sfno(jax.random.PRNGKey(2), 2, 5, 2, lmax)
    x = jnp.asarray(rng.standard_normal((2, 2, L, 2 * L)).astype(np.float32))
    k = 3
    lhs = np.asarray(sfno.apply(params, jnp.roll(x, k, axis=-1)))
    rhs = np.roll(np.asarray(sfno.apply(params, x)), k, axis=-1)
    assert np.max(np.abs(lhs - rhs)) < 1e-4 * max(1.0, np.abs(rhs).max())


@pytest.mark.slow  # train_step in test_training_reduces_loss already
# differentiates the full SFNO; this grad-tree audit is the slow-lane extra
def test_grad_finite(rng):
    lmax = 4
    L = lmax + 1
    params = sfno.init_sfno(jax.random.PRNGKey(3), 1, 3, 1, lmax, n_layers=1)
    x = jnp.asarray(rng.standard_normal((2, 1, L, 2 * L)).astype(np.float32))
    g = jax.grad(sfno.loss_fn)(params, x, x)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(np.isfinite(np.asarray(v)).all()) for v in flat)
