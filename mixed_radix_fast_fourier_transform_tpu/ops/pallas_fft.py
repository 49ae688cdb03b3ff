"""Fused Pallas TPU kernel: whole mixed-radix FFT pipeline in VMEM.

The XLA path (ops/stockham.py) runs one MXU matmul per stage with HBM
round-trips between stages.  This kernel executes *all* stages of a
VMEM-resident batch tile in one Mosaic program using the classic ping-pong
Stockham autosort recurrence

    X: (f, m', l, BT)  →  Y[q',k,j,b] = Σ_p W_f[k,p] · T[p,j] · X[p,q',j,b]
    (m = f·m',  l *= f each stage;  T[p,j] = W_{f·l}^{p·j})

with the batch as the minor (lane) axis, radix combines unrolled at trace
time into VPU adds/multiplies (coefficients that are exactly 0/±1/±i become
plane swaps and sign flips — the classic radix-2/4/8 butterflies fall out
automatically), per-stage twiddles as kernel inputs, and **each stage
materialized through a pair of explicit VMEM scratch buffers** (ping-pong).
The scratch stores are the load-bearing trick: they bound Mosaic's stack
allocation at ~4 buffers (a purely functional straight-line pipeline made
Mosaic stack-allocate every intermediate — 30 MB and 2.7x slower than XLA,
with 15-minute compiles).  One HBM read and one HBM write per plane total,
versus one per stage on the XLA path.

This is the Pallas realization of the reference's hot loop
(mixed_radix_dit_rec, /root/reference/src/highSpeedFFT.c:318-1629): same
mixed-radix decomposition, but autosorted (no strided recursion), batched
across lanes, and correct for every radix from one generic combine.

Scope: batch-tiled transforms with prime factors <= MAX_UNROLL_RADIX and
N·BT within VMEM; everything else falls back to the XLA path (the public op
layer dispatches via :func:`maybe_exec_pallas`).

Status (measured, TPU v5e, 2026-08-16, interleaved A/B): parity with the
OLD 4-matmul XLA pipeline at N=1024 (both ~24 µs b=256), but the engine's
stacked/Karatsuba stage-matmul forms (ops/stockham.py) have since pushed
the XLA path to ~14 µs — the fused VPU kernel now LOSES to the better-fed
MXU at every measured size.  Kept as an opt-in component
(`SpectralConfig.use_pallas = True`; None = auto-on-TPU) because its
one-HBM-pass structure is the right scaffold for future fusion work
(scrambled-order epilogues, in-kernel chirp multiplies), but it is not the
default path and the default should stay False until it wins again.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

MAX_UNROLL_RADIX = 8        # scalar-coefficient unroll bound (radix 2..8)
LANE_TILE = 128             # batch tile = lane width
# Working set ≈ 12 (n, LANE_TILE) fp32 buffers: 4 scratch + in/out blocks with
# pipeline double-buffering + stage temporaries.  48 MiB cap → n <= ~8192.
VMEM_BUDGET_BYTES = 48 * 2 ** 20
VMEM_LIMIT_BYTES = 100 * 2 ** 20  # ask Mosaic for headroom (v5e has > 16 MiB)


def pallas_factors(n: int) -> Tuple[int, ...]:
    """Radix schedule for the unrolled kernel: 2-adic part as radix 8/4/2
    (largest first), odd primes 3/5/7 as-is.  Raises if some prime > 7."""
    if n < 2:
        raise ValueError("pallas path needs n >= 2")
    out: List[int] = []
    v = 0
    while n % 2 == 0:
        n //= 2
        v += 1
    for p in (3, 5, 7):
        while n % p == 0:
            out.append(p)
            n //= p
    if n != 1:
        raise ValueError(f"prime factor {n} > 7: not unrollable")
    out.sort(reverse=True)
    eights, rem = divmod(v, 3)
    twos: List[int] = [8] * eights
    if rem == 2:
        twos.append(4)
    elif rem == 1:
        # prefer 4·4 over 8·2 when possible (radix-2 stages waste a pass)
        if eights:
            twos[-1] = 4
            twos.append(4)
        else:
            twos.append(2)
    return tuple(twos + out)


def supports(n: int, batch: int, itemsize: int = 4) -> bool:
    """Can the fused kernel run this transform?"""
    try:
        pallas_factors(n)
    except ValueError:
        return False
    # scratch + block + temporary working set per tile
    need = 12 * n * LANE_TILE * itemsize
    return need <= VMEM_BUDGET_BYTES


def _coeff(num: int, den: int, sign: int) -> Tuple[object, object]:
    """(re, im) of e^(sign·2πi·num/den) — exact ints at quarter turns,
    fp64 otherwise."""
    frac = Fraction(num % den, den) * sign % 1
    table = {
        Fraction(0): (1, 0),
        Fraction(1, 4): (0, 1),
        Fraction(1, 2): (-1, 0),
        Fraction(3, 4): (0, -1),
    }
    if frac in table:
        return table[frac]
    ang = 2.0 * math.pi * float(frac)
    return math.cos(ang), math.sin(ang)


def _scalar_cmul(wr, wi, zr: Array, zi: Array) -> Tuple[Array, Array]:
    """(wr + i·wi) · (zr + i·zi) with strength reduction for exact 0/±1."""
    if wi == 0:
        if wr == 1:
            return zr, zi
        if wr == -1:
            return -zr, -zi
        return wr * zr, wr * zi
    if wr == 0:
        if wi == 1:
            return -zi, zr
        if wi == -1:
            return zi, -zr
        return -wi * zi, wi * zr
    return wr * zr - wi * zi, wr * zi + wi * zr


def stage_twiddles(
    factors: Sequence[int], sign: int, dtype=np.float32
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Per-stage twiddle planes T[p, j] = e^(sign·2πi·p·j/(f·l)), shape (f, l),
    for every stage with l > 1 (i.e. all but the first), in stage order."""
    out = []
    l = 1
    for f in factors:
        if l > 1:
            p = np.arange(f, dtype=np.int64)[:, None]
            j = np.arange(l, dtype=np.int64)[None, :]
            big = f * l
            phase = (p * j) % big
            ang = sign * 2.0 * np.pi * phase.astype(np.float64) / big
            out.append((np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)))
        l *= f
    return out


def _stage(src_r: Array, src_i: Array, f: int, mp: int, l: int, sign: int,
           tw) -> Tuple[Array, Array]:
    """One Stockham stage on (N, BT) planes: slab twiddles + unrolled combine.
    Returns the stage output in (N, BT) layout."""
    n, bt = src_r.shape
    xr4 = src_r.reshape(f, mp, l, bt)
    xi4 = src_i.reshape(f, mp, l, bt)
    zs: List[Tuple[Array, Array]] = []
    for p in range(f):
        zr, zi = xr4[p], xi4[p]
        if tw is not None and p > 0:
            tr = tw[0][p].reshape(1, l, 1)
            ti = tw[1][p].reshape(1, l, 1)
            zr, zi = zr * tr - zi * ti, zr * ti + zi * tr
        zs.append((zr, zi))
    yks_r: List[Array] = []
    yks_i: List[Array] = []
    for k in range(f):
        acc_r = None
        acc_i = None
        for p in range(f):
            wr, wi = _coeff(k * p, f, sign)
            tr, ti = _scalar_cmul(wr, wi, zs[p][0], zs[p][1])
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        yks_r.append(acc_r)
        yks_i.append(acc_i)
    # Y layout (mp, f, l, bt) -> (N, bt): stack k as axis 1
    return (
        jnp.stack(yks_r, axis=1).reshape(n, bt),
        jnp.stack(yks_i, axis=1).reshape(n, bt),
    )


def _kernel(xr_ref, xi_ref, *rest, factors, sign, n):
    """Ping-pong kernel: each stage writes its full output into one of two
    VMEM scratch pairs.  The explicit stores bound Mosaic's stack allocator
    to ~4 live buffers (see module docstring)."""
    n_tw = sum(1 for _ in factors[1:])
    tw_refs = rest[: 2 * n_tw]
    or_ref, oi_ref = rest[2 * n_tw : 2 * n_tw + 2]
    sa_r, sa_i, sb_r, sb_i = rest[2 * n_tw + 2 :]
    sa_r[:] = xr_ref[:].T  # (BT, N) -> (N, BT): batch on lanes
    sa_i[:] = xi_ref[:].T
    src, dst = (sa_r, sa_i), (sb_r, sb_i)
    l, m = 1, n
    tw_idx = 0
    for f in factors:
        mp = m // f
        tw = None
        if l > 1:
            tw = (tw_refs[2 * tw_idx][:], tw_refs[2 * tw_idx + 1][:])
            tw_idx += 1
        yr, yi = _stage(src[0][:], src[1][:], f, mp, l, sign, tw)
        dst[0][:] = yr
        dst[1][:] = yi
        src, dst = dst, src
        l *= f
        m = mp
    or_ref[:] = src[0][:].T
    oi_ref[:] = src[1][:].T


def maybe_exec_pallas(config, n: int, sign: int, xr: Array, xi: Array):
    """Dispatch helper for the op layer: run the fused kernel when the config
    opts in (use_pallas=True, or None = auto on TPU backends) and the
    transform qualifies; None return means 'use the XLA path'."""
    flag = getattr(config, "use_pallas", False)
    if flag is None:
        flag = jax.default_backend() == "tpu"
    if not flag or n <= 1:
        return None
    batch = 1
    for d in xr.shape[:-1]:
        batch *= d
    if not supports(n, batch):
        return None
    return exec_pallas(xr, xi, n, sign)


def exec_pallas(
    xr: Array, xi: Array, n: int, sign: int, *, interpret: bool | None = None
) -> Tuple[Array, Array]:
    """Batched unnormalized FFT over the last axis via the fused kernel.

    xr/xi: (..., n) fp32 planes.  Batch is flattened and padded to the lane
    tile; the grid runs one program per tile.  ``interpret=None`` auto-selects
    interpreter mode off-TPU (CPU tests run the same kernel code).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    factors = pallas_factors(n)
    batch_shape = xr.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    xr2 = xr.reshape(b, n)
    xi2 = xi.reshape(b, n)
    bt = LANE_TILE
    pad = (-b) % bt
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    grid = (xr2.shape[0] // bt,)

    kernel = functools.partial(_kernel, factors=factors, sign=sign, n=n)
    out_shape = [
        jax.ShapeDtypeStruct(xr2.shape, xr2.dtype),
        jax.ShapeDtypeStruct(xi2.shape, xi2.dtype),
    ]
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tw = stage_twiddles(factors, sign, np.dtype(xr2.dtype).type)
    tw_args = [a for pair in tw for a in pair]
    tw_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in tw_args
    ]
    zr, zi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, *tw_specs],
        out_specs=[spec, spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, bt), xr2.dtype) for _ in range(4)],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(xr2, xi2, *[jnp.asarray(a) for a in tw_args])
    if pad:
        zr, zi = zr[:b], zi[:b]
    return zr.reshape(*batch_shape, n), zi.reshape(*batch_shape, n)
