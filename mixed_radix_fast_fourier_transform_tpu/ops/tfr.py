"""Quadratic time-frequency representations: Wigner-Ville.

The (pseudo-)Wigner-Ville distribution of the analytic signal z:

    W[n, f] = Σ_tau  h[tau] · z[n+tau] · conj(z[n−tau]) · e^{−4πi·f·tau}

— optimal time-frequency concentration for linear chirps (the WVD of a
chirp is a line along its instantaneous frequency), at the price of
cross-terms between components, tamed by the ``window`` h (pseudo-WVD).

TPU shape: the lag products gather through STATIC host index matrices
(z[n+tau], z[n−tau] are two fancy-indexed views — XLA lowers them to
slices), and the lag axis transforms with one batched engine FFT; no
per-time-step loop.  tftb / Matlab ``wvd`` discrete conventions (odd
window, frequency bins f_k = k·fs/(2·nfreq)).

Capability extension: the reference C library has no time-frequency
analysis at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_CONFIG, SpectralConfig
from .fft import fft
from .signal import hilbert
from .stft import get_window

Array = jax.Array


def wigner_ville(
    x,
    nperseg: Optional[int] = None,
    hop: int = 1,
    window="hann",
    analytic: bool = True,
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Pseudo-Wigner-Ville distribution: (…, T) -> (…, n_times, nperseg)
    real array, times n = 0, hop, 2·hop, … and frequency bins
    f_k = k·fs/(2·nperseg) (the lag FFT sees doubled frequencies, so the
    unaliased band is [0, fs/4] for real inputs made analytic; bins above
    nperseg/2 mirror).

    ``nperseg`` (odd; default min(257, largest odd <= T)) is the lag-window
    length — shorter windows smooth cross-terms at some frequency
    resolution cost.  ``analytic=True`` takes the Hilbert analytic signal
    first (halves cross-term interference for real inputs)."""
    x = jnp.asarray(x)
    if x.ndim < 1 or x.shape[-1] < 3:
        raise ValueError("wigner_ville needs a signal of length >= 3")
    T = x.shape[-1]
    if nperseg is None:
        nperseg = min(257, T if T % 2 else T - 1)
    nperseg = int(nperseg)
    if nperseg < 3 or nperseg % 2 == 0:
        raise ValueError(f"nperseg must be odd and >= 3, got {nperseg}")
    if nperseg > T:
        raise ValueError(f"nperseg={nperseg} > signal length {T}")
    if hop < 1:
        raise ValueError(f"hop must be >= 1, got {hop}")
    if analytic and not jnp.issubdtype(x.dtype, jnp.complexfloating):
        z = hilbert(x, config=config)
    else:
        z = x.astype(jnp.result_type(x.dtype, jnp.complex64))
    half = nperseg // 2
    times = np.arange(0, T, hop)
    # static gather indices, zero outside the valid lag range per time
    tau = np.arange(-half, half + 1)  # (nperseg,)
    ip = times[:, None] + tau[None, :]
    im = times[:, None] - tau[None, :]
    valid = (ip >= 0) & (ip < T) & (im >= 0) & (im < T)
    ipc = np.clip(ip, 0, T - 1)
    imc = np.clip(im, 0, T - 1)
    zp = z[..., ipc]
    zm = jnp.conj(z[..., imc])
    w = get_window(window, nperseg - 1, np.float64)
    h = np.concatenate([w, w[:1]])  # symmetric, centered at lag 0
    h = np.fft.ifftshift(h)  # reorder so index 0 is lag 0 after the roll
    prod = zp * zm * jnp.asarray(valid, jnp.real(z).dtype)
    # reorder lags [0..half, -half..-1] for the FFT (lag 0 first)
    prod = jnp.roll(prod, -half, axis=-1)
    prod = prod * jnp.asarray(h, jnp.real(z).dtype)
    W = fft(prod, config=config)
    return jnp.real(W)
