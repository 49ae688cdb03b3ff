"""Packed real FFT: rfft / irfft (L3 of the reference).

TPU-native replacement for `fft_real_init` / `fft_r2c_exec` / `fft_c2r_exec`
(reference: src/real.c:26-193).  Same packed algorithm — an N-point real
transform via an (N/2)-point complex transform plus a split/merge pass — but:

* returns the canonical N/2+1 half spectrum instead of materializing the full
  Hermitian mirror (the reference documents N/2+1 in real.h:56 yet writes N
  entries, src/real.c:128-132 — a verified doc/buffer mismatch);
* the split/merge is a batched vectorized pass (flip + concat, no gathers);
* odd lengths take a full-complex fallback instead of being rejected
  (src/real.c:28-32), so every N is supported.

Everything is expressed on (re, im) planes and is jittable/batched.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..plan import get_plan
from ..utils.config import DEFAULT_CONFIG, SpectralConfig
from ..utils.numerics import from_planes, to_planes
from .fft import _norm_scale, _resize_last
from .stockham import exec_complex, exec_len

Array = jax.Array


def _extend_half(z: Array) -> Array:
    """k=0..h from a length-h array: z[k mod h] = concat([z, z[:1]])."""
    return jnp.concatenate([z, z[..., :1]], axis=-1)


def _reflect_half(z: Array) -> Array:
    """k=0..h from a length-h array: z[(h-k) mod h] = [z0, z_{h-1}, …, z1, z0]."""
    return jnp.concatenate([z[..., :1], jnp.flip(z[..., 1:], -1), z[..., :1]], -1)


def _rfft_packed(x: Array, n: int, config: SpectralConfig):
    """Even-N packed forward path → (re, im) planes of length n//2 + 1.

    Algebra (reference split/unpack, src/real.c:99-125): pack z[m] = x[2m] +
    i·x[2m+1]; Z = FFT_h(z); for k = 0..h with h = n/2:

        Ze[k] = (Z[k] + conj(Z[h-k]))/2        (spectrum of even samples)
        Zo[k] = -i·(Z[k] - conj(Z[h-k]))/2     (spectrum of odd samples)
        X[k]  = Ze[k] + e^(-2πik/n)·Zo[k]

    DC and Nyquist fall out of the same vectorized expression (indices mod h).
    """
    h = n // 2
    zr = x[..., 0::2]
    zi = x[..., 1::2]
    fr, fi = exec_len(config, h, -1, zr, zi)
    ar, ai = _extend_half(fr), _extend_half(fi)          # A = Z[k mod h]
    br, bi = _reflect_half(fr), -_reflect_half(fi)       # B = conj(Z[(h-k) mod h])
    # X = P⊙A + Q⊙B, P/Q precomputed plan constants — one fused pass
    rp = get_plan(n, -1, "real", config)
    xr = (ar * rp.p_re - ai * rp.p_im) + (br * rp.q_re - bi * rp.q_im)
    xi = (ar * rp.p_im + ai * rp.p_re) + (br * rp.q_im + bi * rp.q_re)
    return xr, xi


def _rfft_odd_two_for_one(x: Array, n: int, config: SpectralConfig):
    """Odd-N real forward path, batch >= 2: the classic two-for-one pack.

    The even-N half-length scheme is impossible for odd N (the reference
    simply rejects odd lengths, src/real.c:28-32).  Instead of paying a full
    complex transform per real row (2x the needed work), pack PAIRS of batch
    rows as z = x1 + i·x2 — one complex FFT then separates via Hermitian
    symmetry:  X1 = (Z + conj(Z-))/2,  X2 = -i·(Z - conj(Z-))/2  with
    Z-[k] = Z[(n-k) mod n].  Halves the transform work for any batch >= 2.
    """
    h1 = n // 2 + 1
    batch = x.shape[:-1]
    b = 1
    for d in batch:
        b *= d
    x2 = x.reshape(b, n)
    bp = b + (b % 2)
    if bp != b:
        x2 = jnp.pad(x2, ((0, 1), (0, 0)))
    zr, zi = x2[0::2], x2[1::2]
    plan = get_plan(n, -1, "complex", config)
    fr, fi = exec_complex(plan, zr, zi)
    # Z-[k] = Z[(n-k) mod n], truncated to the n//2+1 output bins
    rr = jnp.concatenate([fr[..., :1], jnp.flip(fr[..., 1:], -1)], -1)[..., :h1]
    ri = jnp.concatenate([fi[..., :1], jnp.flip(fi[..., 1:], -1)], -1)[..., :h1]
    fr, fi = fr[..., :h1], fi[..., :h1]
    half = jnp.asarray(0.5, dtype=fr.dtype)
    x1r, x1i = (fr + rr) * half, (fi - ri) * half
    x2r, x2i = (fi + ri) * half, (rr - fr) * half
    xr = jnp.stack([x1r, x2r], axis=1).reshape(bp, h1)[:b]
    xi = jnp.stack([x1i, x2i], axis=1).reshape(bp, h1)[:b]
    return xr.reshape(*batch, h1), xi.reshape(*batch, h1)


def rfft(
    x,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = "backward",
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Real-input FFT along ``axis`` → n//2 + 1 complex bins."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("rfft requires real input; use fft for complex data")
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1).astype(config.dtype)
    n = int(n) if n is not None else x.shape[-1]
    x = _resize_last(x, n)
    if n % 2 == 0 and n >= 2:
        xr, xi = _rfft_packed(x, n, config)
    elif n > 1 and math.prod(x.shape[:-1]) >= 2:
        xr, xi = _rfft_odd_two_for_one(x, n, config)
    else:
        # Single odd transform / one-point: full complex, keep lower half.
        plan = get_plan(n, -1, "complex", config)
        fr, fi = exec_complex(plan, x, jnp.zeros_like(x))
        xr, xi = fr[..., : n // 2 + 1], fi[..., : n // 2 + 1]
    scale = _norm_scale(n, -1, norm)
    if scale != 1.0:
        s = jnp.asarray(scale, dtype=xr.dtype)
        xr, xi = xr * s, xi * s
    return jnp.moveaxis(from_planes(xr, xi), -1, axis)


def _irfft_packed(xr: Array, xi: Array, n: int, config: SpectralConfig) -> Array:
    """Even-N packed inverse path (reference: src/real.c:150-193).

    From X[0..h], recover Z[k] = Ze[k] + i·Zo[k] (k = 0..h-1) via
        Ze[k] = (X[k] + conj(X[h-k]))/2
        Zo[k] = e^(+2πik/n)·(X[k] - conj(X[h-k]))/2
    then z = IFFT_h(Z)/h, x[2m] = Re z[m], x[2m+1] = Im z[m].
    Only bins 0..h are consumed — Hermitian symmetry is assumed, matching
    numpy.fft.irfft and the reference c2r contract.
    """
    h = n // 2
    # conj(X[h-k]) for k = 0..h-1 from bins 0..h: reversed tail.
    br = jnp.flip(xr[..., 1:], -1)
    bi = -jnp.flip(xi[..., 1:], -1)
    ar, ai = xr[..., :h], xi[..., :h]
    # Z = P⊙A + Q⊙B (same fused combine as forward, with the +sign plan's P/Q)
    rp = get_plan(n, 1, "real", config)
    pr, pi_ = rp.p_re[..., :h], rp.p_im[..., :h]
    qr, qi_ = rp.q_re[..., :h], rp.q_im[..., :h]
    zr = (ar * pr - ai * pi_) + (br * qr - bi * qi_)
    zi = (ar * pi_ + ai * pr) + (br * qi_ + bi * qr)
    gr, gi = exec_len(config, h, 1, zr, zi)
    inv_h = jnp.asarray(1.0 / h, dtype=gr.dtype)
    gr, gi = gr * inv_h, gi * inv_h
    return jnp.stack([gr, gi], axis=-1).reshape(*gr.shape[:-1], n)


def irfft(
    x,
    n: Optional[int] = None,
    axis: int = -1,
    norm: Optional[str] = "backward",
    *,
    config: SpectralConfig = DEFAULT_CONFIG,
) -> Array:
    """Inverse of :func:`rfft`: half spectrum (length n//2+1) → real length n."""
    x = jnp.asarray(x)
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1)
    n = int(n) if n is not None else 2 * (x.shape[-1] - 1)
    if n < 1:
        raise ValueError(f"irfft output length must be >= 1, got {n}")
    x = _resize_last(x, n // 2 + 1)
    xr, xi = to_planes(x, config.dtype)
    # numpy.fft.irfft semantics: the imaginary parts of the DC (and, for even
    # n, Nyquist) bins never enter the c2r algebra — zero them so arbitrary
    # (non-Hermitian) inputs match numpy exactly instead of leaking Im(X[0])
    # into the output (hfft relies on this).
    xi = xi.at[..., 0].set(0.0)
    if n % 2 == 0 and n >= 2:
        xi = xi.at[..., n // 2].set(0.0)
    if n % 2 == 0 and n >= 2:
        out = _irfft_packed(xr, xi, n, config)
    else:
        # Odd length: rebuild the full Hermitian spectrum, then invert PAIRS
        # of spectra through one complex ifft (dual of the forward
        # two-for-one): Z = F1 + i·F2 ⇒ ifft(Z) = x1 + i·x2 exactly, because
        # both inverses are real.  Falls back to a single transform at batch 1.
        fr = jnp.concatenate([xr, jnp.flip(xr[..., 1:], -1)], axis=-1)
        fi = jnp.concatenate([xi, -jnp.flip(xi[..., 1:], -1)], axis=-1)
        plan = get_plan(n, 1, "complex", config)
        batch = fr.shape[:-1]
        b = math.prod(batch)
        if n > 1 and b >= 2:
            bp = b + (b % 2)
            fr2 = fr.reshape(b, n)
            fi2 = fi.reshape(b, n)
            if bp != b:
                fr2 = jnp.pad(fr2, ((0, 1), (0, 0)))
                fi2 = jnp.pad(fi2, ((0, 1), (0, 0)))
            zr = fr2[0::2] - fi2[1::2]
            zi = fi2[0::2] + fr2[1::2]
            gr, gi = exec_complex(plan, zr, zi)
            out = jnp.stack([gr, gi], axis=1).reshape(bp, n)[:b]
            out = out.reshape(*batch, n) / n
        else:
            gr, _ = exec_complex(plan, fr, fi)
            out = gr / n
    # _norm_scale(n, 1, norm) already includes the 1/n of "backward"; the packed
    # path folded 1/h and the interleave supplies the rest ⇒ rescale relative
    # to backward.
    norm = norm or "backward"
    if norm == "ortho":
        out = out * jnp.asarray(math.sqrt(n), dtype=out.dtype)
    elif norm == "forward":
        out = out * jnp.asarray(float(n), dtype=out.dtype)
    return jnp.moveaxis(out, -1, axis)


def hfft(x, n: Optional[int] = None, axis: int = -1, norm="backward",
         *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """FFT of a signal with Hermitian symmetry (real spectrum): half-spectrum
    input (length m) → real output of length n (default 2·(m−1)).  numpy.fft
    identity: hfft(a, n) = irfft(conj(a), n) · n, with norms swapped
    (numpy's hfft 'backward' applies no scale)."""
    x = jnp.asarray(x)
    axis = axis % x.ndim
    m = x.shape[axis]
    n = int(n) if n is not None else 2 * (m - 1)
    norm = norm or "backward"
    if norm not in ("backward", "ortho", "forward"):
        raise ValueError(f"unknown norm {norm!r}")
    inv_norm = {"backward": "forward", "forward": "backward", "ortho": "ortho"}
    return irfft(jnp.conj(x), n=n, axis=axis, norm=inv_norm[norm], config=config)


def ihfft(x, n: Optional[int] = None, axis: int = -1, norm="backward",
          *, config: SpectralConfig = DEFAULT_CONFIG) -> Array:
    """Inverse of :func:`hfft`: real input length n → half spectrum
    (n//2 + 1) with conjugate-inverted phase (numpy.fft.ihfft)."""
    norm = norm or "backward"
    if norm not in ("backward", "ortho", "forward"):
        raise ValueError(f"unknown norm {norm!r}")
    inv_norm = {"backward": "forward", "forward": "backward", "ortho": "ortho"}
    return jnp.conj(rfft(x, n=n, axis=axis, norm=inv_norm[norm], config=config))


def hfftn(x, s=None, axes=None, norm="backward", *, config=DEFAULT_CONFIG):
    """N-D FFT of an array with Hermitian symmetry in the last transform
    axis → real output (scipy.fft.hfftn): hfftn(a, s) = irfftn(conj(a), s)
    scaled by prod(s), with norms swapped per axis-count."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if s is None:
        s = tuple(
            x.shape[a] if a != axes[-1] else 2 * (x.shape[a] - 1) for a in axes
        )
    norm = norm or "backward"
    if norm not in ("backward", "ortho", "forward"):
        raise ValueError(f"unknown norm {norm!r}")
    inv_norm = {"backward": "forward", "forward": "backward", "ortho": "ortho"}
    return irfftn(jnp.conj(x), s=s, axes=axes, norm=inv_norm[norm],
                  config=config)


def ihfftn(x, s=None, axes=None, norm="backward", *, config=DEFAULT_CONFIG):
    """Inverse of :func:`hfftn` (scipy.fft.ihfftn): real input → conjugated
    half-spectrum over the last transform axis."""
    norm = norm or "backward"
    if norm not in ("backward", "ortho", "forward"):
        raise ValueError(f"unknown norm {norm!r}")
    inv_norm = {"backward": "forward", "forward": "backward", "ortho": "ortho"}
    return jnp.conj(rfftn(x, s=s, axes=axes, norm=inv_norm[norm],
                          config=config))


def hfft2(x, s=None, axes=(-2, -1), norm="backward", *, config=DEFAULT_CONFIG):
    """2-D Hermitian FFT (scipy.fft.hfft2)."""
    return hfftn(x, s=s, axes=axes, norm=norm, config=config)


def ihfft2(x, s=None, axes=(-2, -1), norm="backward", *,
           config=DEFAULT_CONFIG):
    """Inverse 2-D Hermitian FFT (scipy.fft.ihfft2)."""
    return ihfftn(x, s=s, axes=axes, norm=norm, config=config)


def rfftn(x, s=None, axes=None, norm="backward", *, config=DEFAULT_CONFIG):
    """N-D real FFT: rfft over the last requested axis, complex fft over the rest."""
    from .fft import fft, _axes_shape

    x = jnp.asarray(x)
    s, axes = _axes_shape(x, s, axes)
    out = rfft(x, n=s[-1], axis=axes[-1], norm=norm, config=config)
    for n_i, a in zip(s[:-1], axes[:-1]):
        out = fft(out, n=n_i, axis=a, norm=norm, config=config)
    return out


def irfftn(x, s=None, axes=None, norm="backward", *, config=DEFAULT_CONFIG):
    """Inverse N-D real FFT (numpy.fft.irfftn): complex ifft over the leading
    requested axes, irfft over the last."""
    from .fft import ifft, _axes_shape

    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if s is None:
        s = tuple(
            x.shape[a] if a != axes[-1] else 2 * (x.shape[a] - 1) for a in axes
        )
    for n_i, a in zip(s[:-1], axes[:-1]):
        x = ifft(x, n=n_i, axis=a, norm=norm, config=config)
    return irfft(x, n=s[-1], axis=axes[-1], norm=norm, config=config)


def rfft2(x, s=None, axes=(-2, -1), norm="backward", *, config=DEFAULT_CONFIG):
    """2-D real FFT (numpy.fft.rfft2): rfftn over the given two axes."""
    return rfftn(x, s=s, axes=axes, norm=norm, config=config)


def irfft2(x, s=None, axes=(-2, -1), norm="backward", *, config=DEFAULT_CONFIG):
    """Inverse 2-D real FFT (numpy.fft.irfft2)."""
    return irfftn(x, s=s, axes=axes, norm=norm, config=config)
