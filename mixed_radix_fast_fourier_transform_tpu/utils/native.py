"""ctypes bindings to the native planner/oracle library (native/).

The reference's entire runtime is native C; here the *host-side* runtime
pieces — planning, twiddle generation, and the fp64 oracle engine — have a
C++ implementation (native/planner.cpp, native/oracle.cpp) with this module
as the binding layer.  Every entry point has a pure-Python fallback, so the
package works identically without the shared library; `available()` reports
which backend is live and the test suite asserts parity between the two.

Build: `python native/build.py` (or `python -m pip install -e .`, which runs
it via setup.py).  Loading is lazy and failure-tolerant.
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    pathlib.Path(__file__).resolve().parents[2] / "native" / "libspectral_native.so",
]

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for path in _LIB_PATHS:
        if not path.exists():
            continue
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            continue
        c_i64 = ctypes.c_int64
        c_i32 = ctypes.c_int32
        pd = ctypes.POINTER(ctypes.c_double)
        pi = ctypes.POINTER(c_i64)
        lib.spectral_prime_factors.restype = c_i64
        lib.spectral_prime_factors.argtypes = [c_i64, pi, c_i64]
        lib.spectral_is_smooth.restype = c_i32
        lib.spectral_is_smooth.argtypes = [c_i64, c_i64]
        lib.spectral_plan_stages.restype = c_i64
        lib.spectral_plan_stages.argtypes = [c_i64, c_i64, pi, c_i64]
        lib.spectral_dft_matrix.restype = None
        lib.spectral_dft_matrix.argtypes = [c_i64, c_i32, pd, pd]
        lib.spectral_split_twiddles.restype = None
        lib.spectral_split_twiddles.argtypes = [c_i64, c_i64, c_i32, pd, pd]
        lib.spectral_chirp.restype = None
        lib.spectral_chirp.argtypes = [c_i64, c_i64, c_i32, pd, pd]
        lib.spectral_real_split_twiddles.restype = None
        lib.spectral_real_split_twiddles.argtypes = [c_i64, c_i64, c_i32, pd, pd]
        lib.spectral_oracle_fft.restype = c_i32
        lib.spectral_oracle_fft.argtypes = [pd, pd, c_i64, c_i64, c_i32]
        # padded-length helpers (added with next_splittable_len; tolerate an
        # older .so without them)
        for name, restype, argtypes in (
            ("spectral_next_fast_len", c_i64, [c_i64]),
            ("spectral_prev_fast_len", c_i64, [c_i64]),
            ("spectral_next_splittable_len", c_i64, [c_i64, c_i64, c_i64]),
        ):
            try:
                fn = getattr(lib, name)
                fn.restype = restype
                fn.argtypes = argtypes
            except AttributeError:
                pass
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def reset() -> None:
    """Drop the cached library handle and retry loading on next use.

    The load is normally attempted once per process; this re-arms it so a
    library that appeared (just built) or disappeared (deleted/replaced
    mid-session) is picked up without restarting.  The factorize layer's
    native-vs-Python dispatch memo is cleared too, so the pure-Python
    fallback genuinely kicks in — not just at import time."""
    global _lib, _load_attempted
    _lib = None
    _load_attempted = False
    from . import factorize

    factorize._use_native.cache_clear()


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def prime_factors(n: int) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    buf = np.zeros(64, dtype=np.int64)
    cnt = lib.spectral_prime_factors(n, _ip(buf), 64)
    if cnt < 0:
        raise ValueError(f"native prime_factors failed for n={n}")
    return [int(v) for v in buf[:cnt]]


def plan_stages(n: int, max_stage: int) -> Optional[Tuple[int, ...]]:
    lib = _load()
    if lib is None:
        return None
    buf = np.zeros(64, dtype=np.int64)
    cnt = lib.spectral_plan_stages(n, max_stage, _ip(buf), 64)
    if cnt < 0:
        raise ValueError(
            f"native plan_stages: prime factor of {n} exceeds max_stage={max_stage}"
        )
    return tuple(int(v) for v in buf[:cnt])


def dft_matrix(f: int, sign: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    re = np.empty((f, f), dtype=np.float64)
    im = np.empty((f, f), dtype=np.float64)
    lib.spectral_dft_matrix(f, sign, _dp(re), _dp(im))
    return re, im


def split_twiddles(f: int, m: int, sign: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    re = np.empty((f, m), dtype=np.float64)
    im = np.empty((f, m), dtype=np.float64)
    lib.spectral_split_twiddles(f, m, sign, _dp(re), _dp(im))
    return re, im


def chirp(n: int, count: int, sign: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    re = np.empty(count, dtype=np.float64)
    im = np.empty(count, dtype=np.float64)
    lib.spectral_chirp(n, count, sign, _dp(re), _dp(im))
    return re, im


def real_split_twiddles(n: int, sign: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    count = n // 2 + 1
    re = np.empty(count, dtype=np.float64)
    im = np.empty(count, dtype=np.float64)
    lib.spectral_real_split_twiddles(n, count, sign, _dp(re), _dp(im))
    return re, im


def prev_fast_len(n: int) -> Optional[int]:
    """Native largest 7-smooth length <= n; None if the library is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "spectral_prev_fast_len"):
        return None
    m = lib.spectral_prev_fast_len(n)
    if m < 0:
        raise ValueError(f"native prev_fast_len failed for n={n}")
    return int(m)


def next_fast_len(n: int) -> Optional[int]:
    lib = _load()
    if lib is None or not hasattr(lib, "spectral_next_fast_len"):
        return None
    m = lib.spectral_next_fast_len(n)
    if m < 0:
        raise ValueError(f"native next_fast_len failed for n={n}")
    return int(m)


def next_splittable_len(n: int, parts: int, max_stage: int) -> Optional[int]:
    lib = _load()
    if lib is None or not hasattr(lib, "spectral_next_splittable_len"):
        return None
    m = lib.spectral_next_splittable_len(n, parts, max_stage)
    if m < 0:
        raise ValueError(
            f"native next_splittable_len: parts={parts} invalid for "
            f"max_stage={max_stage}"
        )
    return int(m)


def oracle_fft(x: np.ndarray, sign: int = -1) -> Optional[np.ndarray]:
    """Unnormalized fp64 FFT over the last axis via the native engine.

    Returns None when the library is unavailable (callers fall back to
    numpy.fft).  Correct for every length, unlike the reference C library.
    """
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.complex128)
    n = x.shape[-1]
    batch = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    out = np.empty_like(x)
    rc = lib.spectral_oracle_fft(
        _dp(x.view(np.float64)), _dp(out.view(np.float64)), n, batch, sign
    )
    if rc != 0:
        raise ValueError(f"native oracle_fft failed (n={n}, sign={sign})")
    return out
