"""Complex-as-planes helpers.

TPU VPU/MXU units operate on real arrays; complex64 on TPU is decomposed by
XLA anyway, and keeping explicit (re, im) fp32 planes (struct-of-arrays) gives
the engine direct control over fusion and matmul shapes — the opposite of the
reference's interleaved `fft_data {re, im}` AoS layout (src/highspeedFFT.h:20-23)
which does not vectorize.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def to_planes(x, dtype=jnp.float32) -> Tuple[Array, Array]:
    """Split a complex (or real) array into (re, im) planes of ``dtype``."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.real(x).astype(dtype), jnp.imag(x).astype(dtype)
    x = x.astype(dtype)
    return x, jnp.zeros_like(x)


def from_planes(re: Array, im: Array) -> Array:
    """Combine (re, im) planes into a complex array (complex64 for fp32
    planes).  lax.complex only accepts fp32/fp64, so low-precision working
    dtypes (bf16) upcast at the boundary — compute stays in the working dtype,
    only the user-facing complex view widens."""
    if re.dtype not in (jnp.float32, jnp.float64):
        re = re.astype(jnp.float32)
        im = im.astype(jnp.float32)
    return jax.lax.complex(re, im)


def cmul(ar: Array, ai: Array, br: Array, bi: Array) -> Tuple[Array, Array]:
    """Elementwise complex multiply on planes."""
    return ar * br - ai * bi, ar * bi + ai * br


def conj_planes(re: Array, im: Array) -> Tuple[Array, Array]:
    return re, -im
