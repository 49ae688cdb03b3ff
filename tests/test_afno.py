"""AFNO model family: shapes, mode truncation, gradient flow, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixed_radix_fast_fourier_transform_tpu.models import afno


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = afno.init_afno(
        key, in_channels=2, dim=32, out_channels=1, patch=4,
        n_layers=2, n_blocks=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 2))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    return params, x, tgt


def test_forward_shape(setup):
    params, x, _ = setup
    y = afno.apply(params, x, patch=4)
    assert y.shape == (2, 16, 16, 1)
    assert y.dtype == jnp.float32
    # hard mode truncation keeps shapes
    yh = afno.apply(params, x, patch=4, hard_fraction=0.5)
    assert yh.shape == y.shape
    assert not np.allclose(np.asarray(yh), np.asarray(y))


def test_grads_flow_through_spectral_mlp(setup):
    params, x, tgt = setup
    grads = jax.grad(afno.loss_fn)(params, x, tgt, patch=4)
    g = grads["blocks"][0]["w1_re"]
    assert float(jnp.abs(g).max()) > 0.0
    g2 = grads["blocks"][1]["w2_im"]
    assert float(jnp.abs(g2).max()) > 0.0


def test_training_reduces_loss(setup):
    params, x, tgt = setup
    step = jax.jit(lambda p, a, b: afno.train_step(p, a, b, lr=3e-2, patch=4))
    p = params
    first = None
    for _ in range(120):
        p, l = step(p, x, tgt)
        if first is None:
            first = float(l)
    assert float(l) < 0.9 * first, (first, float(l))


def test_filter_zero_weights_zero_output(setup):
    """With zero spectral weights and biases, the filter contributes 0 —
    the residual stream passes through the block MLP only."""
    params, x, _ = setup
    blk = jax.tree_util.tree_map(jnp.zeros_like, params["blocks"][0])
    y = afno.afno_filter(blk, x[..., :1].repeat(32, -1), 4)
    assert float(jnp.abs(y).max()) == 0.0


def test_patch_divisibility_error(setup):
    params, _, _ = setup
    with pytest.raises(ValueError):
        afno.apply(params, jnp.zeros((1, 15, 16, 2)), patch=4)
    with pytest.raises(ValueError):
        afno.init_block(jax.random.PRNGKey(0), 30, 4)
