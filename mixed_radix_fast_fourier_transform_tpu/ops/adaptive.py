"""Adaptive filters: LMS, NLMS, RLS.

Sample-recursive adaptation (echo cancellation, channel equalization,
noise cancellation) — inherently sequential in its coefficient updates, so
these run as `lax.scan` recurrences over static (n_taps,) windows (one
gather builds every regression vector up front; the scan carries only the
weight state).  The filter OUTPUT for frozen weights is a convolution —
use ops/convolve for that; these exist for the time-varying adaptation the
convolution theorem cannot express.

Capability extension (padasip/MATLAB dsp.LMSFilter class); no analogue in
the reference.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig

Array = jax.Array

__all__ = ["lms_filter", "nlms_filter", "rls_filter"]


def _regressors(x: Array, n_taps: int) -> Array:
    """(T, n_taps) sliding regression vectors u[k] = [x[k], …, x[k−m+1]]
    (zero-prehistory), via one static gather."""
    T = x.shape[0]
    pad = jnp.concatenate([jnp.zeros(n_taps - 1, x.dtype), x])
    idx = (np.arange(T)[:, None] + np.arange(n_taps)[None, :][:, ::-1])
    return pad[idx]


def _check(x, d, n_taps):
    x = jnp.asarray(x, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    if x.ndim != 1 or d.shape != x.shape:
        raise ValueError("x and d must be 1-D of equal length")
    if not 1 <= n_taps <= x.shape[0]:
        raise ValueError(f"need 1 <= n_taps <= len(x), got {n_taps}")
    return x, d


def lms_filter(x, d, n_taps: int, mu: float = 0.01, *,
               w0: Optional[Array] = None,
               config: SpectralConfig = DEFAULT_CONFIG
               ) -> Tuple[Array, Array, Array]:
    """Least-mean-squares adaptation: returns (y, e, w) — the filter output,
    the error d − y, and the final weights.  Update
    w ← w + μ·e[k]·u[k] (Widrow-Hoff)."""
    x, d = _check(x, d, n_taps)
    U = _regressors(x, n_taps)

    def step(w, inp):
        u, dk = inp
        y = u @ w
        e = dk - y
        return w + mu * e * u, (y, e)

    w_init = (jnp.zeros(n_taps, jnp.float32) if w0 is None
              else jnp.asarray(w0, jnp.float32))
    w, (y, e) = jax.lax.scan(step, w_init, (U, d))
    return y, e, w


def nlms_filter(x, d, n_taps: int, mu: float = 0.5, eps: float = 1e-6, *,
                w0: Optional[Array] = None,
                config: SpectralConfig = DEFAULT_CONFIG
                ) -> Tuple[Array, Array, Array]:
    """Normalized LMS: step size divided by the regressor energy
    ‖u‖² + eps — stable for 0 < μ < 2 regardless of signal scale."""
    x, d = _check(x, d, n_taps)
    U = _regressors(x, n_taps)

    def step(w, inp):
        u, dk = inp
        y = u @ w
        e = dk - y
        return w + (mu / (u @ u + eps)) * e * u, (y, e)

    w_init = (jnp.zeros(n_taps, jnp.float32) if w0 is None
              else jnp.asarray(w0, jnp.float32))
    w, (y, e) = jax.lax.scan(step, w_init, (U, d))
    return y, e, w


def rls_filter(x, d, n_taps: int, lam: float = 0.99, delta: float = 100.0, *,
               w0: Optional[Array] = None,
               config: SpectralConfig = DEFAULT_CONFIG
               ) -> Tuple[Array, Array, Array]:
    """Recursive least squares with forgetting factor ``lam``: order of
    magnitude faster convergence than LMS at O(n_taps²) per step (the scan
    carries the inverse correlation matrix P, initialized δ·I)."""
    x, d = _check(x, d, n_taps)
    if not 0 < lam <= 1:
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    U = _regressors(x, n_taps)

    def step(carry, inp):
        w, P = carry
        u, dk = inp
        Pu = P @ u
        k = Pu / (lam + u @ Pu)
        y = u @ w
        e = dk - y
        w_new = w + k * e
        P_new = (P - jnp.outer(k, Pu)) / lam
        return (w_new, P_new), (y, e)

    w_init = (jnp.zeros(n_taps, jnp.float32) if w0 is None
              else jnp.asarray(w0, jnp.float32))
    P0 = delta * jnp.eye(n_taps, dtype=jnp.float32)
    (w, _), (y, e) = jax.lax.scan(step, (w_init, P0), (U, d))
    return y, e, w
