"""Discrete cosine/sine transforms (types II/III) via the FFT engine.

Capability extension beyond the reference (which offers only complex/real
FFTs): the scipy.fft dct/idct surface for the two workhorse types, computed
the TPU way — one batched real FFT of a reordered sequence plus a fused
twiddle pass (Makhoul's N-point method: no 2N/4N padding).

    DCT-II:  y[k] = 2 Σ_m x[m] cos(π k (2m+1) / (2N))
    DCT-III: the inverse pairing (scipy's idct of type 2)

norm=None matches scipy's unnormalized convention; norm='ortho' makes each
transform orthonormal (and dct/idct exact inverses).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..plan import get_plan
from ..utils.config import DEFAULT_CONFIG, SpectralConfig
from .stockham import exec_complex

Array = jax.Array


def _makhoul_reorder(x: Array) -> Array:
    """v[m] = x[2m], v[N-1-m] = x[2m+1]: even samples forward, odds reversed."""
    return jnp.concatenate([x[..., 0::2], jnp.flip(x[..., 1::2], -1)], axis=-1)


def _dct2_core(x: Array, n: int, config: SpectralConfig):
    """Unnormalized DCT-II via an n-point complex FFT of the reordered input."""
    v = _makhoul_reorder(x)
    plan = get_plan(n, -1, "complex", config)
    vr, vi = exec_complex(plan, v, jnp.zeros_like(v))
    # y[k] = 2·Re( e^{-iπk/(2n)} · V[k] )
    k = np.arange(n)
    ang = -np.pi * k / (2.0 * n)
    cr = jnp.asarray(np.cos(ang), dtype=v.dtype)
    ci = jnp.asarray(np.sin(ang), dtype=v.dtype)
    return 2.0 * (vr * cr - vi * ci)


def dct(
    x,
    type: int = 2,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """DCT of type 2 or 3 along ``axis`` (scipy.fft.dct-compatible)."""
    if type not in (2, 3):
        raise ValueError(f"only DCT types 2 and 3 are supported, got {type}")
    if norm not in (None, "ortho"):
        raise ValueError(f"norm must be None or 'ortho', got {norm!r}")
    x = jnp.asarray(x)
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1).astype(config.dtype)
    if n is not None:
        n = int(n)
        cur = x.shape[-1]
        if cur >= n:
            x = x[..., :n]
        else:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - cur)])
    n = x.shape[-1]
    if n < 1:
        raise ValueError("dct needs n >= 1")

    if type == 2:
        y = _dct2_core(x, n, config)
        if norm == "ortho":
            s = np.full(n, math.sqrt(1.0 / (2.0 * n)))
            s[0] /= math.sqrt(2.0)
            y = y * jnp.asarray(s, dtype=y.dtype)
    else:  # type 3: y[m] = x[0] + 2 Σ_{k>=1} x[k] cos(πk(2m+1)/(2N))
        if norm == "ortho":
            # orthonormal III = exact inverse of orthonormal II: pre-scale so
            # the unnormalized-III core below produces it
            s = np.full(n, 1.0 / math.sqrt(2.0 * n))
            s[0] = 1.0 / math.sqrt(n)
            x = x * jnp.asarray(s, dtype=x.dtype)
        # Invert Makhoul (scaled): V[k] = e^{+iπk/(2n)}·(x[k] - i·x[n-k])
        # (x[n]≡0), v = unnormalized IFFT_n(V), y[2m] = v[m],
        # y[2m+1] = v[n-1-m] — the n and 1/2 factors cancel against the
        # unnormalized type-III definition.
        k = np.arange(n)
        ang = np.pi * k / (2.0 * n)
        cr = jnp.asarray(np.cos(ang), dtype=x.dtype)
        ci = jnp.asarray(np.sin(ang), dtype=x.dtype)
        tail = jnp.concatenate(
            [jnp.zeros_like(x[..., :1]), jnp.flip(x[..., 1:], -1)], axis=-1
        )
        ar, ai = x, -tail
        vr = ar * cr - ai * ci
        vi = ar * ci + ai * cr
        plan = get_plan(n, 1, "complex", config)  # unnormalized inverse FFT
        wr, _ = exec_complex(plan, vr, vi)
        even = wr[..., : (n + 1) // 2]
        odd = jnp.flip(wr[..., (n + 1) // 2 :], -1)
        y = jnp.zeros_like(wr)
        y = y.at[..., 0::2].set(even)
        y = y.at[..., 1::2].set(odd)
    return jnp.moveaxis(y, -1, axis)


def idct(
    x,
    type: int = 2,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Inverse DCT (scipy pairing: idct(·, type=2) == dct(·, type=3) scaled)."""
    if type not in (2, 3):
        raise ValueError(f"only DCT types 2 and 3 are supported, got {type}")
    inv_type = 3 if type == 2 else 2
    y = dct(x, type=inv_type, n=n, axis=axis, norm=norm, config=config)
    if norm is None:
        nn = y.shape[axis]
        y = y / (2.0 * nn)
    return y


def dctn(
    x,
    type: int = 2,
    axes=None,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """N-D DCT: separable 1-D DCTs over ``axes`` (scipy.fft.dctn)."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    for a in axes:
        x = dct(x, type=type, axis=a, norm=norm, config=config)
    return x


def idctn(
    x,
    type: int = 2,
    axes=None,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    for a in axes:
        x = idct(x, type=type, axis=a, norm=norm, config=config)
    return x


def _alt_sign(n: int, dtype) -> Array:
    return jnp.asarray((-1.0) ** np.arange(n), dtype=dtype)


def dst(
    x,
    type: int = 2,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """DST of type 2 or 3 (scipy.fft.dst-compatible), via the exact flip/sign
    identities DST-II(x) = flip(DCT-II((-1)^m x)) and
    DST-III(x) = (-1)^m · DCT-III(flip(x)) — both carry the ortho scaling
    through unchanged."""
    if type not in (2, 3):
        raise ValueError(f"only DST types 2 and 3 are supported, got {type}")
    x = jnp.asarray(x)
    axis = axis % x.ndim
    xm = jnp.moveaxis(x, axis, -1).astype(config.dtype)
    if n is not None:
        cur = xm.shape[-1]
        n = int(n)
        xm = xm[..., :n] if cur >= n else jnp.pad(
            xm, [(0, 0)] * (xm.ndim - 1) + [(0, n - cur)]
        )
    nn = xm.shape[-1]
    sgn = _alt_sign(nn, xm.dtype)
    if type == 2:
        y = jnp.flip(dct(xm * sgn, 2, axis=-1, norm=norm, config=config), -1)
    else:
        y = sgn * dct(jnp.flip(xm, -1), 3, axis=-1, norm=norm, config=config)
    return jnp.moveaxis(y, -1, axis)


def idst(
    x,
    type: int = 2,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Inverse DST (pairing mirrors idct)."""
    if type not in (2, 3):
        raise ValueError(f"only DST types 2 and 3 are supported, got {type}")
    inv_type = 3 if type == 2 else 2
    y = dst(x, type=inv_type, n=n, axis=axis, norm=norm, config=config)
    if norm is None:
        nn = y.shape[axis]
        y = y / (2.0 * nn)
    return y
