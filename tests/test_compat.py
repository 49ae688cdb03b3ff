"""Compat-layer tests: API parity with the reference C library.

Two tiers:
1. Self-consistency tests of the compat surface (always run).
2. Bit-level parity vs the *compiled reference itself*, built from
   /root/reference at session scope — run only on the sizes where the
   reference is verified correct (SURVEY.md §2.9), skipped if no compiler
   or no reference checkout is available.
"""

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu.compat as compat

REF_SRC = "/root/reference/src"

# Sizes where the compiled reference is verified correct (SURVEY.md §2.9):
# every non-innermost factor in {5, 8, 11, >=14}, innermost not a bare 2;
# Bluestein sizes whose padded length 2^m has m mod 3 in {0, 2}.
REF_CORRECT_SIZES = [3, 4, 5, 7, 8, 11, 15, 20, 24, 25, 32, 40, 64, 100, 121,
                     256, 512, 2048, 4096, 67, 127, 521, 1009]


@pytest.fixture(scope="session")
def ref_lib():
    if not os.path.isdir(REF_SRC) or shutil.which("gcc") is None:
        pytest.skip("reference sources or gcc unavailable")
    d = tempfile.mkdtemp(prefix="hsfft_oracle_")
    so = os.path.join(d, "libhsfft.so")
    srcs = [os.path.join(REF_SRC, f) for f in
            ("highSpeedFFT.c", "real.c", "convolve.c")]
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared", *srcs, f"-I{REF_SRC}", "-lm", "-o", so],
        check=True, capture_output=True,
    )
    lib = ctypes.CDLL(so)
    lib.fft_init.restype = ctypes.c_void_p
    lib.fft_init.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.fft_exec.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.fft_real_init.restype = ctypes.c_void_p
    lib.fft_real_init.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.fft_r2c_exec.argtypes = [ctypes.c_void_p] * 3
    lib.fft_c2r_exec.argtypes = [ctypes.c_void_p] * 3
    return lib


def _ref_fft(lib, x, sgn):
    n = len(x)
    obj = lib.fft_init(n, sgn)
    assert obj, f"reference fft_init({n}) returned NULL"
    inp = np.zeros(2 * n)
    inp[0::2], inp[1::2] = x.real, x.imag
    out = np.zeros(2 * n)
    lib.fft_exec(obj, inp.ctypes.data_as(ctypes.c_void_p),
                 out.ctypes.data_as(ctypes.c_void_p))
    return out[0::2] + 1j * out[1::2]


@pytest.mark.parametrize("n", REF_CORRECT_SIZES)
@pytest.mark.parametrize("sgn", [1, -1])
def test_fft_exec_matches_reference(ref_lib, rng, n, sgn):
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    want = _ref_fft(ref_lib, x, sgn)
    obj = compat.fft_init(n, sgn)
    got = np.asarray(compat.fft_exec(obj, x.astype(np.complex64)),
                     dtype=np.complex128)
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-5, f"N={n} sgn={sgn}: rel err {err}"


def test_r2c_matches_reference(ref_lib, rng):
    n = 64
    x = rng.standard_normal(n)
    obj = ref_lib.fft_real_init(n, 1)
    out = np.zeros(2 * n)
    xi = np.ascontiguousarray(x)
    ref_lib.fft_r2c_exec(obj, xi.ctypes.data_as(ctypes.c_void_p),
                         out.ctypes.data_as(ctypes.c_void_p))
    want = out[0::2] + 1j * out[1::2]  # full mirrored length-N buffer
    robj = compat.fft_real_init(n, 1)
    got = np.asarray(compat.fft_r2c_exec(robj, x.astype(np.float32)),
                     dtype=np.complex128)
    assert got.shape == (n,)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def test_c2r_matches_reference(ref_lib, rng):
    n = 64
    spec = np.fft.fft(rng.standard_normal(n))
    inp = np.zeros(2 * n)
    inp[0::2], inp[1::2] = spec.real, spec.imag
    out = np.zeros(n)
    obj = ref_lib.fft_real_init(n, -1)
    ref_lib.fft_c2r_exec(obj, inp.ctypes.data_as(ctypes.c_void_p),
                         out.ctypes.data_as(ctypes.c_void_p))
    robj = compat.fft_real_init(n, -1)
    got = np.asarray(compat.fft_c2r_exec(robj, spec.astype(np.complex64)))
    assert np.max(np.abs(got - out)) / np.max(np.abs(out)) < 1e-5


# ------------------------- self-consistency tier -------------------------

def test_sign_conventions(rng):
    """sgn=+1 == numpy forward; sgn=-1 == unnormalized inverse."""
    n = 360
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    fwd = np.asarray(compat.fft_exec(compat.fft_init(n, 1), x), np.complex128)
    np.testing.assert_allclose(fwd, np.fft.fft(x.astype(np.complex128)),
                               atol=1e-4 * np.abs(fwd).max())
    inv = np.asarray(compat.fft_exec(compat.fft_init(n, -1), x), np.complex128)
    np.testing.assert_allclose(inv, np.fft.ifft(x.astype(np.complex128)) * n,
                               atol=1e-4 * np.abs(inv).max())


def test_roundtrip_unnormalized(rng):
    n = 1024  # reference is WRONG here (leaf-2 bug); we must be right
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    f = compat.fft_exec(compat.fft_init(n, 1), x)
    b = np.asarray(compat.fft_exec(compat.fft_init(n, -1), np.asarray(f))) / n
    np.testing.assert_allclose(b, x, atol=1e-4)


def test_crash_sizes_work():
    """N = 1, 13, 257 crash the reference (SURVEY.md §2.9); must work here."""
    for n in (1, 13, 257):
        obj = compat.fft_init(n, 1)
        assert obj is not None and obj.N == n
        x = np.ones(n, np.complex64)
        out = np.asarray(compat.fft_exec(obj, x), np.complex128)
        np.testing.assert_allclose(out, np.fft.fft(np.ones(n)), atol=1e-4 * n)


def test_fft_exec_rejects_wrong_length_and_pins_dtype(rng):
    """The host/native path must validate input length against the plan and
    return the config dtype (complex64), matching the device path regardless
    of whether libspectral_native.so is present."""
    obj = compat.fft_init(1024, 1)
    with pytest.raises(ValueError):
        compat.fft_exec(obj, np.zeros(512, np.complex64))
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
    out = compat.fft_exec(obj, x)
    assert np.asarray(out).dtype == np.complex64


def test_plan_struct_fields():
    obj = compat.fft_init(1024, 1)
    assert (obj.N, obj.sgn, obj.lt) == (1024, 1, 0)
    assert obj.factors == (8, 8, 8, 2) and obj.lf == 4  # reference ordering
    bobj = compat.fft_init(1009, 1)
    assert bobj.lt == 1  # Bluestein
    assert compat.fft_init(0, 1) is None  # NULL on invalid, like the reference
    compat.free_fft(obj)  # no-op, must not raise


def test_factors_reference_order():
    assert compat.factors(32) == [8, 4]
    assert compat.factors(5040) == [8, 7, 5, 3, 3, 2]
    assert compat.factors(19 * 4) == [19, 4]
    assert compat.factors(59) == [59]  # residual prime


def test_longvector_layout():
    """Telescoped flat layout with correct dynamic values (the reference's
    intended semantics, minus its table bugs)."""
    n, fs = 12, [3, 4]  # outer 3, inner 4 — a combination the reference corrupts
    v = compat.longvectorN(n, fs, sgn=1)
    assert v.shape == (n - 1,)
    # innermost stage L=4, Ls=1: block at index 0, values e^(-2πi(k+1)·0/4) = 1
    np.testing.assert_allclose(v[0:3], np.ones(3), atol=1e-12)
    # outer stage L=12, Ls=4: block at index 3, v[3 + j*2 + k] = e^(-2πi(k+1)j/12)
    for j in range(4):
        for k in range(2):
            want = np.exp(-2j * np.pi * (k + 1) * j / 12)
            np.testing.assert_allclose(v[3 + j * 2 + k], want, atol=1e-12)


def test_convolve_compat(rng):
    a = rng.standard_normal(20).astype(np.float32)
    b = rng.standard_normal(14).astype(np.float32)
    out, ln = compat.fft_convolve("full", "linear", a, b)
    want = np.convolve(a.astype(np.float64), b.astype(np.float64))
    assert ln == 33
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4 * np.abs(want).max())
    out, ln = compat.fft_convolve("same", "linear", a, b)
    assert ln == 20
    out, ln = compat.fft_convolve("valid", "linear", a, b)
    assert ln == 7
    # circular: wraps at next_pow2(max) and returns the padded buffer
    out, ln = compat.fft_convolve(None, "circular", a, b)
    assert ln == 32
    full = np.convolve(a.astype(np.float64), b.astype(np.float64))
    want = np.zeros(32)
    for i, v in enumerate(full):
        want[i % 32] += v
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4 * np.abs(want).max())
    # invalid args → (None, -1) like the reference's -1 return
    _, ln = compat.fft_convolve("full", "bogus", a, b)
    assert ln == -1


def test_demo_utilities():
    sig = compat.generate_signal(64)
    assert compat.compute_mse(sig, sig) == 0.0
    rsig = compat.generate_real_signal(64)
    assert compat.compute_mse_real(rsig, rsig) == 0.0
    assert compat.next_power_of_two(513) == 1024
    assert compat.find_optimal_fft_length(33, "linear", 20, 14) == 64
    assert compat.find_optimal_fft_length(20, "circular", 20, 14) == 32
