"""Trainable PCEN frontend: gradient flow and a 2-class toy training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixed_radix_fast_fourier_transform_tpu.models import audio_frontend as af


@pytest.fixture
def data():
    sr = 16000.0
    t = np.arange(4000) / sr
    rng = np.random.default_rng(0)

    def batch(n):
        xs, ys = [], []
        for i in range(n):
            f0 = 400.0 if i % 2 == 0 else 1600.0
            amp = rng.uniform(0.2, 2.0)  # loudness nuisance PCEN removes
            xs.append(amp * np.sin(2 * np.pi * f0 * t
                                   + rng.uniform(0, 2 * np.pi)))
            ys.append(i % 2)
        return (np.stack(xs).astype(np.float32),
                np.asarray(ys, np.int32))

    return batch


def test_shapes_and_grad_flow(data):
    x, y = data(4)
    params = af.init_params(jax.random.PRNGKey(0), n_mels=24, n_classes=2)
    logits = af.apply(params, x)
    assert np.asarray(logits).shape == (4, 2)
    _, grads = jax.value_and_grad(lambda p: af.loss_fn(p, x, y))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    # every parameter (incl. the per-band PCEN coefficients) gets gradient
    for g in flat:
        assert float(jnp.max(jnp.abs(g))) > 0.0


def test_training_separates_classes(data):
    x, y = data(16)
    params = af.init_params(jax.random.PRNGKey(1), n_mels=24, n_classes=2)
    step = jax.jit(lambda p, xx, yy: af.train_step(p, xx, yy, lr=0.2))
    loss0 = None
    for i in range(60):
        params, loss = step(params, x, y)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.3 * loss0, (loss0, float(loss))
    xt, yt = data(8)
    pred = np.argmax(np.asarray(af.apply(params, xt)), -1)
    assert (pred == yt).mean() >= 0.9
