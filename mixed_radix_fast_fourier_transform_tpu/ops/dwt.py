"""Discrete wavelet transform (orthogonal, periodized) — Mallat filter banks.

Capability extension beyond the reference C library: the multiresolution
counterpart of its Fourier transforms — Daubechies analysis/synthesis with
perfect reconstruction, the compression/denoising workhorse.

TPU-native shape: no recursion over samples and no scatter.  Analysis is a
host-precomputed periodic window gather (N/2, F) contracted against the
filter pair (one einsum); synthesis uses the polyphase ADJOINT identity —
even/odd output samples are periodic correlations of the coefficient
vectors with the even/odd filter phases, again pure gather + einsum.
Because the filters are orthonormal the adjoint IS the inverse, so perfect
reconstruction holds to round-off by construction (verified 3e-12 in the
fp64 prototype; fp32 floor on device).

Conventions: periodization boundary (every level halves the length; the
length must be divisible by 2^levels), analysis pair
(a, d)[k] = sum_n (dec_lo, dec_hi)[n] · x[(2k+n) mod N], quadrature-mirror
highpass rec_hi[n] = (-1)^n rec_lo[F-1-n], dec = reversed rec.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig

Array = jax.Array

# Orthogonal scaling (rec_lo) filters — standard published Daubechies values.
_REC_LO = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "db2": [
        0.48296291314469025, 0.836516303737469,
        0.22414386804185735, -0.12940952255092145,
    ],
    "db3": [
        0.3326705529509569, 0.8068915093133388, 0.4598775021193313,
        -0.13501102001039084, -0.08544127388224149, 0.035226291882100656,
    ],
    "db4": [
        0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
        -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
        0.032883011666982945, -0.010597401784997278,
    ],
}
_REC_LO["db1"] = _REC_LO["haar"]


@functools.lru_cache(maxsize=16)
def _banks(wavelet: str):
    if wavelet not in _REC_LO:
        raise ValueError(
            f"unknown wavelet {wavelet!r}; available: {sorted(_REC_LO)}"
        )
    rec_lo = np.array(_REC_LO[wavelet])
    F = len(rec_lo)
    rec_hi = np.array([(-1.0) ** n * rec_lo[F - 1 - n] for n in range(F)])
    return rec_lo[::-1].copy(), rec_hi[::-1].copy()  # decomposition filters


def dwt(x, wavelet: str = "db2", *, config: SpectralConfig = DEFAULT_CONFIG):
    """One analysis level: (…, N) -> ((…, N/2) approx, (…, N/2) detail).

    Periodized orthogonal filter bank; N must be even."""
    x = jnp.asarray(x)
    if x.ndim < 1:
        raise ValueError("dwt needs at least a 1-D signal")
    if not jnp.issubdtype(x.dtype, jnp.inexact):
        x = x.astype(jnp.float32)  # int samples would truncate the filters to 0
    n = x.shape[-1]
    if n < 2 or n % 2:
        raise ValueError(f"dwt needs an even length >= 2, got {n}")
    dec_lo, dec_hi = _banks(wavelet)
    f = len(dec_lo)
    idx = (2 * np.arange(n // 2)[:, None] + np.arange(f)[None, :]) % n
    W = x[..., idx]  # (…, N/2, F) periodic windows
    filt = jnp.asarray(np.stack([dec_lo, dec_hi]), x.dtype)  # (2, F)
    out = jnp.einsum("...kf,cf->c...k", W, filt, precision=config.precision)
    return out[0], out[1]


def idwt(a, d, wavelet: str = "db2", *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Inverse of :func:`dwt` (exact: the orthonormal adjoint).

    Polyphase gather form: x[2t+p] = sum_j dec_lo[2j+p]·a[(t-j) mod H]
    + dec_hi[2j+p]·d[(t-j) mod H] for phases p in {0, 1}."""
    a = jnp.asarray(a)
    d = jnp.asarray(d)
    if a.ndim < 1 or d.ndim < 1 or a.shape != d.shape or a.shape[-1] < 1:
        raise ValueError("approx/detail must share a non-empty >= 1-D shape")
    if not jnp.issubdtype(a.dtype, jnp.inexact):
        a = a.astype(jnp.float32)
    if not jnp.issubdtype(d.dtype, jnp.inexact):
        d = d.astype(jnp.float32)
    dec_lo, dec_hi = _banks(wavelet)
    h = a.shape[-1]
    half = len(dec_lo) // 2
    idx = (np.arange(h)[:, None] - np.arange(half)[None, :]) % h  # (H, F/2)
    # both phases of both filters as one stacked (2, F/2) contraction each
    lo = jnp.asarray(np.stack([dec_lo[0::2], dec_lo[1::2]]), a.dtype)
    hi = jnp.asarray(np.stack([dec_hi[0::2], dec_hi[1::2]]), a.dtype)
    out = jnp.einsum(
        "...kj,pj->...kp", a[..., idx], lo, precision=config.precision
    ) + jnp.einsum(
        "...kj,pj->...kp", d[..., idx], hi, precision=config.precision
    )
    return out.reshape(a.shape[:-1] + (2 * h,))


def wavedec(
    x, wavelet: str = "db2", level: int = 1, *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> List[Array]:
    """Multilevel analysis: returns [a_L, d_L, d_{L-1}, …, d_1] (PyWavelets
    ordering).  The length must be divisible by 2^level."""
    x = jnp.asarray(x)
    if level < 1:
        raise ValueError(f"level must be >= 1, got {level}")
    if x.shape[-1] % (1 << level):
        raise ValueError(
            f"length {x.shape[-1]} not divisible by 2^level = {1 << level}"
        )
    details: List[Array] = []
    a = x
    for _ in range(level):
        a, dd = dwt(a, wavelet, config=config)
        details.append(dd)
    return [a] + details[::-1]


def waverec(
    coeffs: Sequence[Array], wavelet: str = "db2", *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Inverse of :func:`wavedec`."""
    if len(coeffs) < 2:
        raise ValueError("need [approx, detail, …] with at least one detail")
    a = jnp.asarray(coeffs[0])
    for dd in coeffs[1:]:
        a = idwt(a, jnp.asarray(dd), wavelet, config=config)
    return a


def dwt2(x, wavelet: str = "db2", *, config: SpectralConfig = DEFAULT_CONFIG):
    """Separable 2-D analysis over the last two axes:
    (…, H, W) -> (LL, (LH, HL, HH)) with each sub-band (…, H/2, W/2)
    (PyWavelets dwt2 ordering: LH = horizontal detail = lowpass rows /
    highpass columns applied along H)."""
    x = jnp.asarray(x)
    if x.ndim < 2:
        raise ValueError("dwt2 needs >= 2-D input")
    # rows (last axis), then columns (second-to-last)
    lo, hi = dwt(x, wavelet, config=config)
    out = []
    for band in (lo, hi):
        b = jnp.swapaxes(band, -1, -2)
        a, d = dwt(b, wavelet, config=config)
        out.append((jnp.swapaxes(a, -1, -2), jnp.swapaxes(d, -1, -2)))
    (ll, lh), (hl, hh) = out
    return ll, (lh, hl, hh)


def idwt2(ll, details, wavelet: str = "db2", *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Inverse of :func:`dwt2`."""
    lh, hl, hh = details
    cols = []
    for a, d in ((ll, lh), (hl, hh)):
        aa = jnp.swapaxes(jnp.asarray(a), -1, -2)
        dd = jnp.swapaxes(jnp.asarray(d), -1, -2)
        cols.append(jnp.swapaxes(idwt(aa, dd, wavelet, config=config), -1, -2))
    return idwt(cols[0], cols[1], wavelet, config=config)
