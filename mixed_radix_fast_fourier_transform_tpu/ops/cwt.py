"""Continuous wavelet transform via batched FFT convolution.

Capability extension beyond the reference C library (1-D FFT/convolution
only, src/convolve.c): the scipy.signal ``cwt`` surface — convolution of a
signal with scaled wavelets, one row per width:

    out[i] = convolve(data, conj(wavelet(min(10*widths[i], N), widths[i]))[::-1],
                      mode='same')

TPU-native shape: scipy loops N_widths separate direct convolutions with
per-scale kernel lengths; here every kernel is centre-embedded into one
common length (padding both sides by amounts that keep 'same' alignment
exact) and the whole bank runs as ONE batched FFT convolution through the
engine — (W, M) kernels against (1, N) data, three transforms total instead
of W direct O(N·M) passes.  Wavelet sampling happens on host in fp64 (the
kernels are plan-time constants, like twiddles — see CLAUDE.md conventions).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig
from .convolve import fft_convolve

Array = jax.Array


def ricker(points: int, a: float) -> np.ndarray:
    """Ricker ("Mexican hat") wavelet, scipy.signal.ricker-compatible:
    A (1 - (t/a)^2) exp(-t^2 / (2 a^2)), A = 2 / (sqrt(3a) pi^(1/4))."""
    if points < 1:
        raise ValueError(f"points must be >= 1, got {points}")
    amp = 2.0 / (np.sqrt(3.0 * a) * np.pi**0.25)
    t = np.arange(points, dtype=np.float64) - (points - 1) / 2.0
    mod = 1.0 - (t / a) ** 2
    return amp * mod * np.exp(-(t**2) / (2.0 * a**2))


def morlet2(points: int, s: float, w: float = 5.0) -> np.ndarray:
    """Complex Morlet wavelet, scipy.signal.morlet2-compatible:
    pi^(-1/4) sqrt(1/s) exp(i w t/s) exp(-t^2/(2 s^2))."""
    if points < 1:
        raise ValueError(f"points must be >= 1, got {points}")
    t = (np.arange(points, dtype=np.float64) - (points - 1) / 2.0) / s
    return np.pi**-0.25 * np.sqrt(1.0 / s) * np.exp(1j * w * t - t**2 / 2.0)


def cwt(
    data,
    wavelet: Callable[..., np.ndarray],
    widths: Sequence[float],
    *,
    dtype=None,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Continuous wavelet transform, scipy.signal.cwt-compatible.

    ``wavelet(points, width)`` is sampled on host for each width with
    ``points = min(10*width, len(data))`` and correlated with ``data``
    ('same' mode, conjugate-reversed kernel — matching scipy).  Returns
    (len(widths), …, N) with the width axis leading and any batch axes of
    ``data`` preserved.  Complex wavelets (morlet2) yield complex output.
    """
    x = jnp.asarray(data)
    n = x.shape[-1]
    if n < 1:
        raise ValueError("data must be non-empty")
    widths = list(widths)
    if not widths:
        raise ValueError("widths must be non-empty")
    kernels = []
    for wd in widths:
        points = min(10 * wd, n)  # scipy convention (float ok: arange rounds up)
        kernels.append(np.conj(np.asarray(wavelet(points, wd))[::-1]))
    m = max(k.shape[0] for k in kernels)
    bank = np.zeros(
        (len(kernels), m),
        dtype=np.complex128 if any(np.iscomplexobj(k) for k in kernels)
        else np.float64,
    )
    for i, k in enumerate(kernels):
        # centre-embed so 'same' alignment matches the unpadded kernel:
        # full-conv shifts by lo, 'same' centre moves by (m-1)//2 - (L-1)//2
        lo = (m - 1) // 2 - (k.shape[0] - 1) // 2
        bank[i, lo : lo + k.shape[0]] = k
    if dtype is None:
        dtype = (
            jnp.complex64
            if np.iscomplexobj(bank) or jnp.issubdtype(x.dtype, jnp.complexfloating)
            else jnp.float32
        )
    out_complex = jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)
    bankj = jnp.asarray(bank.astype(np.complex128 if out_complex else np.float64))
    # broadcast: kernels (W, 1…, M) against data (1, …, N)
    bankj = bankj.reshape((len(kernels),) + (1,) * max(x.ndim - 1, 0) + (m,))
    got = fft_convolve(
        x[None].astype(dtype), bankj.astype(dtype), mode="same", config=config
    )
    return got.astype(dtype)
