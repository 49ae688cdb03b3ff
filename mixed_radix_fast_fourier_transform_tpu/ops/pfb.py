"""Polyphase filterbank channelizer (weighted overlap-add spectrometer).

Capability extension (the reference C library has none): the standard
critically-sampled K-channel analysis PFB used by SDR / radio-astronomy
spectrometers — a P-tap-per-branch windowed-sinc prototype filter applied
as a polyphase weighting, then one length-K FFT per frame:

    y[m, k_out] = FFT_K( Σ_p h[p·K + k] · x[m·K + p·K + k] )

Compared with a bare FFT spectrogram the PFB's channel response is flat
in-band with far lower leakage (the prototype's stopband), at the cost of
P− 1 frames of latency.

TPU shape: the signal reshapes into (frames, P, K) windows, the polyphase
weighting is one broadcast multiply + reduction over P that XLA fuses into
the frame load (VPU), and the channel transform is the engine's batched
length-K FFT (MXU stage matmuls).  The prototype filter is a host fp64
constant, like twiddles (CLAUDE.md conventions).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig

Array = jax.Array


def pfb_prototype(n_channels: int, taps_per_branch: int = 8,
                  window: str = "hamming") -> np.ndarray:
    """Windowed-sinc prototype lowpass for a K-channel PFB, length P·K,
    cutoff at the channel half-width (1/(2K) cycles/sample), peak-normalized
    so a unit-amplitude in-band tone keeps unit channel gain."""
    from .stft import get_window

    K, P = int(n_channels), int(taps_per_branch)
    if K < 2:
        raise ValueError(f"n_channels must be >= 2, got {K}")
    if P < 1:
        raise ValueError(f"taps_per_branch must be >= 1, got {P}")
    n = np.arange(P * K, dtype=np.float64)
    t = (n - (P * K - 1) / 2.0) / K
    h = np.sinc(t) * np.asarray(get_window(window, P * K), np.float64)
    # DC gain 1: each branch carries ~1/K of the weight and the channel FFT
    # sums K branches coherently, so a unit complex tone at a channel
    # center gives |y| = 1 (a real cosine splits to 1/2 at ±k0)
    return h / h.sum()


def pfb_analysis(
    x,
    n_channels: int,
    taps_per_branch: int = 8,
    window: str = "hamming",
    h: Optional[np.ndarray] = None,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Critically-sampled K-channel analysis PFB: (…, T) ->
    (…, frames, K) complex with frames = T//K − P + 1 (valid frames only —
    no zero-padded warm-up), channel k centered on frequency k/K
    cycles/sample (FFT bin order; real inputs give Hermitian channels).

    Pass ``h`` (length P·K) to override the :func:`pfb_prototype` filter.
    """
    from .fft import fft as _fft

    x = jnp.asarray(x)
    K, P = int(n_channels), int(taps_per_branch)
    if h is None:
        h = pfb_prototype(K, P, window)
    else:
        h = np.asarray(h, np.float64)
        if h.ndim != 1 or h.size % K:
            raise ValueError(
                f"prototype filter length {h.size} must be a multiple of "
                f"n_channels {K}"
            )
        P = h.size // K
    if x.shape[-1] < (P + 1) * K:
        raise ValueError(
            f"signal length {x.shape[-1]} too short for {P} taps of "
            f"{K} channels (need >= {(P + 1) * K})"
        )
    n_frames = x.shape[-1] // K - P + 1
    rdt = jnp.result_type(x.dtype, jnp.float32)
    cdt = jnp.result_type(rdt, jnp.complex64)
    xv = x[..., : (n_frames + P - 1) * K].astype(
        cdt if jnp.issubdtype(x.dtype, jnp.complexfloating) else rdt
    )
    # frame m, tap p, branch k reads x[(m+p)·K + k]: an overlapping view —
    # build it as a reshape to (blocks, K) plus a static window stack
    blocks = xv.reshape(xv.shape[:-1] + (n_frames + P - 1, K))
    frames = jnp.stack(
        [blocks[..., p : p + n_frames, :] for p in range(P)], axis=-2
    )  # (…, frames, P, K)
    hw = jnp.asarray(h.reshape(P, K), rdt)
    v = jnp.sum(frames * hw, axis=-2)  # (…, frames, K)
    return _fft(v.astype(cdt), config=config)


def pfb_frequencies(n_channels: int, fs: float = 1.0) -> np.ndarray:
    """Center frequency of each PFB channel (FFT bin order)."""
    return np.fft.fftfreq(int(n_channels)) * fs
