"""Real FFT tests vs numpy fp64 oracle (reference L3: src/real.c)."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

TOL = 1e-5

EVEN_SIZES = [2, 4, 8, 16, 32, 64, 360, 4096, 5040]
ODD_SIZES = [1, 3, 5, 9, 15, 121, 1009]  # fallback path; reference rejects odd N


def _rel_err(got, want):
    got = np.asarray(got, dtype=np.complex128)
    want = np.asarray(want, dtype=np.complex128)
    return np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-30)


@pytest.mark.parametrize("n", EVEN_SIZES + ODD_SIZES)
def test_rfft_matches_numpy(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    got = sp.rfft(x)
    want = np.fft.rfft(x.astype(np.float64))
    assert got.shape == (n // 2 + 1,)
    assert _rel_err(got, want) < TOL, f"N={n}"


@pytest.mark.parametrize("n", EVEN_SIZES + [9, 15])
def test_irfft_roundtrip(rng, n):
    if n == 1:
        return
    x = rng.standard_normal(n).astype(np.float32)
    back = sp.irfft(np.asarray(sp.rfft(x)), n=n)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-5 * max(1, n**0.5))


@pytest.mark.parametrize("n", [64, 360])
def test_irfft_matches_numpy(rng, n):
    spec = np.fft.rfft(rng.standard_normal(n))
    got = sp.irfft(spec.astype(np.complex64), n=n)
    want = np.fft.irfft(spec, n=n)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_irfft_default_length(rng):
    spec = np.fft.rfft(rng.standard_normal(64)).astype(np.complex64)
    assert sp.irfft(spec).shape == (64,)


# lane-budget audit (round 4): the full 4x4 {n} x {bshape} grid re-ran the
# same two code paths 16 times (~45 s of trace time).  Distinct paths kept:
# even batch count for every n class, odd batch count (zero-row pad) and
# multi-dim batch once each.
@pytest.mark.parametrize("n,bshape", [
    (3, (2,)), (9, (2,)), (15, (2,)), (1009, (2,)),
    (15, (3,)), (15, (2, 3)),
])
def test_odd_batched_two_for_one(rng, n, bshape):
    """Odd-N batched rfft/irfft take the two-for-one pairing path (including
    odd batch counts, which pad one zero row)."""
    x = rng.standard_normal(bshape + (n,)).astype(np.float32)
    got = sp.rfft(x)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert _rel_err(got, want) < TOL
    back = sp.irfft(np.asarray(got), n=n)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-4)


@pytest.mark.parametrize("norm", ["backward", "ortho", "forward"])
def test_rfft_norms(rng, norm):
    n = 4096
    x = rng.standard_normal(n).astype(np.float32)
    got = sp.rfft(x, norm=norm)
    want = np.fft.rfft(x.astype(np.float64), norm=norm)
    assert _rel_err(got, want) < TOL
    back = sp.irfft(np.asarray(got), n=n, norm=norm)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-3)


def test_rfft_batched_and_axis(rng):
    x = rng.standard_normal((3, 360, 2)).astype(np.float32)
    got = sp.rfft(x, axis=1)
    want = np.fft.rfft(x.astype(np.float64), axis=1)
    assert got.shape == want.shape
    assert _rel_err(got, want) < TOL


def test_rfft_hermitian_consistency(rng):
    """rfft bins must equal the lower half of the complex fft (the reference
    instead mirrors a full-length buffer — real.c:128-132 doc/buffer mismatch)."""
    n = 128
    x = rng.standard_normal(n).astype(np.float32)
    full = np.asarray(sp.fft(x))
    half = np.asarray(sp.rfft(x))
    np.testing.assert_allclose(half, full[: n // 2 + 1], atol=1e-4)


def test_rfftn_irfftn(rng):
    x = rng.standard_normal((8, 60)).astype(np.float32)
    got = sp.rfftn(x)
    want = np.fft.rfftn(x.astype(np.float64))
    assert _rel_err(got, want) < TOL
    back = sp.irfftn(np.asarray(got), s=x.shape)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_rfft_rejects_complex(rng):
    with pytest.raises(ValueError):
        sp.rfft(np.zeros(8, np.complex64))


@pytest.mark.parametrize("norm", ["backward", "ortho", "forward"])
def test_hfft_ihfft_match_numpy(rng, norm):
    a = (rng.standard_normal((3, 9)) + 1j * rng.standard_normal((3, 9))).astype(
        np.complex64
    )
    got = sp.hfft(a, norm=norm)
    want = np.fft.hfft(a.astype(np.complex128), norm=norm, axis=-1)
    assert np.asarray(got).shape == want.shape
    assert np.max(np.abs(np.asarray(got) - want)) / np.max(np.abs(want)) < 2e-5
    x = rng.standard_normal((3, 20)).astype(np.float32)
    got = sp.ihfft(x, norm=norm)
    want = np.fft.ihfft(x.astype(np.float64), norm=norm, axis=-1)
    assert np.max(np.abs(np.asarray(got) - want)) / np.max(np.abs(want)) < 2e-5


@pytest.mark.parametrize("n", [15, 16])
def test_irfft_non_hermitian_matches_numpy(rng, n):
    """numpy.fft.irfft drops the imaginary parts of the DC/Nyquist bins; the
    packed and odd paths must do the same for arbitrary complex input."""
    a = (
        rng.standard_normal((2, n // 2 + 1)) + 1j * rng.standard_normal((2, n // 2 + 1))
    ).astype(np.complex64)
    got = sp.irfft(a, n=n)
    want = np.fft.irfft(a.astype(np.complex128), n=n, axis=-1)
    assert np.max(np.abs(np.asarray(got) - want)) < 2e-5


def test_rfft2_irfft2_roundtrip(rng):
    img = rng.standard_normal((3, 16, 24)).astype(np.float32)
    spec = sp.rfft2(img)
    want = np.fft.rfft2(img.astype(np.float64))
    assert np.max(np.abs(np.asarray(spec) - want)) / np.max(np.abs(want)) < 2e-5
    back = sp.irfft2(np.asarray(spec), s=(16, 24))
    assert np.max(np.abs(np.asarray(back) - img)) < 1e-4


# -------------------------------------------------- Hermitian N-D (scipy.fft)

@pytest.mark.parametrize("norm", ["backward", "ortho", "forward"])
def test_hfft2_ihfft2_match_scipy(rng, norm):
    import scipy.fft as sf
    x = rng.standard_normal((6, 9)).astype(np.float32)
    got = np.asarray(sp.ihfft2(x, norm=norm))
    want = sf.ihfft2(x.astype(np.float64), norm=norm)
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(sp.hfft2(got, s=x.shape, norm=norm))
    np.testing.assert_allclose(back, sf.hfft2(want, s=x.shape, norm=norm),
                               atol=1e-4)


def test_hfftn_roundtrip_and_scipy(rng):
    import scipy.fft as sf
    x = rng.standard_normal((4, 5, 8)).astype(np.float32)
    h = np.asarray(sp.ihfftn(x))
    np.testing.assert_allclose(h, sf.ihfftn(x.astype(np.float64)), atol=1e-5)
    rt = np.asarray(sp.hfftn(h, s=x.shape))
    np.testing.assert_allclose(rt, x, atol=1e-4)


def test_hfftn_axes_subset(rng):
    import scipy.fft as sf
    x = (rng.standard_normal((3, 10, 6))
         + 1j * rng.standard_normal((3, 10, 6))).astype(np.complex64)
    got = np.asarray(sp.hfftn(x, axes=(1, 2)))
    want = sf.hfftn(x.astype(np.complex128), axes=(1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3 * np.abs(want).max())
