"""Trainable audio frontend: log-mel + learnable PCEN + linear head.

Sixth model family on the engine: the keyword-spotting / acoustic-event
frontend of Wang et al. 2017 ("Trainable Frontend For Robust and
Far-Field Keyword Spotting"), where PCEN's gain, bias, power and
smoothing coefficients are LEARNED per mel band instead of fixed.  The
whole pipeline — engine STFT → mel filterbank matmul → one-pole
smoother (lax.scan) → PCEN pointwise → mean-pool → linear classifier —
is a dict-pytree functional model like the other families
(init/apply/loss_fn/train_step, all jittable, differentiating through
every FFT stage and through the smoother scan).

Positivity is enforced by parameterization (exp/sigmoid), so SGD stays
unconstrained.  The reference C library ships no models at all.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import melspectrogram, pcen
from ..utils.config import DEFAULT_CONFIG, SpectralConfig

Array = jax.Array
Params = Dict[str, Array]


def init_frontend(key, n_mels: int = 40, dtype=jnp.float32) -> Params:
    """Per-band PCEN parameters at the published initialization
    (gain 0.98, bias 2, power 0.5, smoothing b ≈ 0.025)."""
    del key  # deterministic init (kept for API symmetry)
    ones = jnp.ones((n_mels,), dtype)
    b0 = 0.025
    return {
        "log_gain": jnp.log(0.98) * ones,
        "log_bias": jnp.log(2.0) * ones,
        "log_power": jnp.log(0.5) * ones,
        "smooth_logit": jnp.log(b0 / (1 - b0)) * ones,
    }


def init_classifier(key, n_mels: int, n_classes: int,
                    dtype=jnp.float32) -> Params:
    s = 1.0 / jnp.sqrt(jnp.asarray(n_mels, jnp.float32))
    return {
        "w": (s * jax.random.normal(key, (n_mels, n_classes))).astype(dtype),
        "b": jnp.zeros((n_classes,), dtype),
    }


def apply_frontend(
    params: Params,
    x,
    sr: float = 16000.0,
    n_fft: int = 512,
    hop: Optional[int] = None,
    eps: float = 1e-6,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """(…, T) waveforms -> (…, frames, n_mels) PCEN features with the
    TRAINED per-band coefficients."""
    n_mels = params["log_gain"].shape[0]
    hop = n_fft // 4 if hop is None else int(hop)
    M = melspectrogram(x, sr, n_fft=n_fft, hop=hop, n_mels=n_mels,
                       config=config)
    # the shared ops/mel.pcen kernel with learned per-band coefficients
    return pcen(
        M,
        gain=jnp.exp(params["log_gain"]),
        bias=jnp.exp(params["log_bias"]),
        power=jnp.exp(params["log_power"]),
        b=jax.nn.sigmoid(params["smooth_logit"]),
        eps=eps,
        config=config,
    )


def apply(params: Dict[str, Params], x, sr: float = 16000.0,
          n_fft: int = 512, hop: Optional[int] = None,
          *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Full model: frontend -> mean-pool over frames -> linear logits."""
    feats = apply_frontend(params["frontend"], x, sr, n_fft, hop,
                           config=config)
    pooled = jnp.mean(feats, axis=-2)
    head = params["head"]
    return pooled @ head["w"] + head["b"]


def init_params(key, n_mels: int = 40, n_classes: int = 2,
                dtype=jnp.float32) -> Dict[str, Params]:
    kf, kh = jax.random.split(key)
    return {
        "frontend": init_frontend(kf, n_mels, dtype),
        "head": init_classifier(kh, n_mels, n_classes, dtype),
    }


def loss_fn(params, x, labels, sr: float = 16000.0, n_fft: int = 512,
            *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Mean softmax cross-entropy over integer ``labels``."""
    logits = apply(params, x, sr, n_fft, config=config)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - picked)


def train_step(params, x, labels, lr: float = 0.05,
               sr: float = 16000.0, n_fft: int = 512,
               *, config: SpectralConfig = DEFAULT_CONFIG):
    """One SGD step; returns (params, loss).  Jit the closure over
    (lr, sr, n_fft)."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, x, labels, sr, n_fft, config=config)
    )(params)
    new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new, loss
