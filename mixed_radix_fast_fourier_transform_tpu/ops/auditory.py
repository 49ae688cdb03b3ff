"""Auditory-model analysis: ERB scale, gammatonegram, modulation spectrum.

The cochlear front-end stack on top of the existing pieces: the
Glasberg-Moore ERB-rate scale, a gammatone FIR bank (ops/signal.gammatone
per band) applied as ONE batched FFT convolution — the filterbank's band
axis rides the rfft batch dimension, so the whole cochleagram is three
engine transforms regardless of band count — and the amplitude-modulation
spectrum (envelope rFFT per band) that auditory/speech-intelligibility
models (e.g. the speech transmission index family) read their 2-16 Hz
syllable-rate energy from.

Capability extension; the reference has no analysis layer at all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig
from .convolve import fft_convolve
from .rfft import rfft
from .signal import gammatone, hilbert

Array = jax.Array

__all__ = ["erb_space", "gammatone_filterbank", "gammatonegram",
           "modulation_spectrum"]

_EAR_Q = 9.26449      # Glasberg & Moore 1990 constants
_MIN_BW = 24.7


def _as_float(x: Array) -> Array:
    """Integer PCM input would truncate the sub-unity filter taps to zero —
    promote to float before the bank cast."""
    if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
            x.dtype, jnp.complexfloating):
        return x
    return x.astype(jnp.float32)


def erb_space(fmin: float, fmax: float, n: int) -> np.ndarray:
    """``n`` center frequencies equally spaced on the ERB-rate scale
    between ``fmin`` and ``fmax`` (descending-free: returned ascending)."""
    if not 0 < fmin < fmax:
        raise ValueError("need 0 < fmin < fmax")
    if n < 1:
        raise ValueError("n must be >= 1")
    c = _EAR_Q * _MIN_BW
    lo = np.log(fmin + c)
    hi = np.log(fmax + c)
    return np.exp(np.linspace(lo, hi, n)) - c


def gammatone_filterbank(n_filters: int, fs: float, fmin: float = 50.0,
                         fmax: Optional[float] = None,
                         numtaps: Optional[int] = None) -> Tuple[np.ndarray,
                                                                 np.ndarray]:
    """(impulse responses (n_filters, numtaps), center frequencies): a bank
    of 4th-order FIR gammatones on the ERB-rate ladder (host design
    constants, like any filter taps)."""
    if fmax is None:
        fmax = 0.45 * fs
    freqs = erb_space(fmin, fmax, n_filters)
    bank = np.stack([gammatone(f, "fir", numtaps=numtaps, fs=fs)[0]
                     for f in freqs])  # numtaps default lives in gammatone
    return bank.astype(np.float64), freqs


def gammatonegram(x, fs: float, n_filters: int = 64, hop: Optional[int] = None,
                  fmin: float = 50.0, fmax: Optional[float] = None,
                  *, power: float = 2.0,
                  config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Cochleagram: (..., n_filters, frames) band energies.

    One batched FFT convolution applies every gammatone at once (bands
    broadcast against the signal), then per-band energies are averaged over
    ``hop``-sized frames (default 10 ms).  ``power``=2 gives energy, 1
    gives magnitude."""
    x = _as_float(jnp.asarray(x))
    if hop is None:
        hop = max(int(0.010 * fs), 1)
    bank, freqs = gammatone_filterbank(n_filters, fs, fmin, fmax)
    if x.shape[-1] < bank.shape[1]:
        raise ValueError(f"signal length {x.shape[-1]} shorter than the "
                         f"gammatone filters ({bank.shape[1]} taps)")
    # (..., 1, T) conv (..1.., bands, taps) -> (..., bands, T)
    bank_b = jnp.asarray(bank, x.dtype).reshape(
        (1,) * (x.ndim - 1) + bank.shape)
    y = fft_convolve(x[..., None, :], bank_b, mode="same", config=config)
    env = jnp.abs(y) ** power
    T = env.shape[-1]
    n_frames = T // hop
    env = env[..., : n_frames * hop]
    env = env.reshape(*env.shape[:-1], n_frames, hop)
    return jnp.mean(env, axis=-1)


def modulation_spectrum(x, fs: float, n_filters: int = 32,
                        fmin: float = 50.0, fmax: Optional[float] = None,
                        *, config: SpectralConfig = DEFAULT_CONFIG
                        ) -> Tuple[Array, np.ndarray, np.ndarray]:
    """Amplitude-modulation spectrum: (S, carrier_freqs, mod_freqs) with
    S (..., n_filters, n_mod_bins) = |rFFT of each band's mean-removed
    Hilbert envelope|² — the syllable-rate (2-16 Hz) energy map of auditory
    and intelligibility models.  Band mean levels are REMOVED before the
    transform (the DC bin is ~0); normalize modulation depth against the
    band energies from :func:`gammatonegram` if needed."""
    x = _as_float(jnp.asarray(x))
    bank, freqs = gammatone_filterbank(n_filters, fs, fmin, fmax)
    if x.shape[-1] < bank.shape[1]:
        raise ValueError(f"signal length {x.shape[-1]} shorter than the "
                         f"gammatone filters ({bank.shape[1]} taps)")
    bank_b = jnp.asarray(bank, x.dtype).reshape(
        (1,) * (x.ndim - 1) + bank.shape)
    y = fft_convolve(x[..., None, :], bank_b, mode="same", config=config)
    env = jnp.abs(hilbert(y, config=config))
    env = env - jnp.mean(env, axis=-1, keepdims=True)
    spec = jnp.abs(rfft(env, axis=-1, config=config)) ** 2
    mod_freqs = np.fft.rfftfreq(int(env.shape[-1]), 1.0 / fs)
    return spec, freqs, mod_freqs
