"""FFT convolution tests (reference L4: src/convolve.c) vs direct oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _direct_circular(a, b, period):
    out = np.zeros(period)
    for i in range(len(a)):
        for j in range(len(b)):
            out[(i + j) % period] += a[i] * b[j]
    return out


@pytest.mark.parametrize("n1,n2", [(16, 16), (100, 17), (5, 64), (1, 9), (33, 7)])
@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_linear_modes_match_numpy(rng, n1, n2, mode):
    a = rng.standard_normal(n1).astype(np.float32)
    b = rng.standard_normal(n2).astype(np.float32)
    got = np.asarray(sp.fft_convolve(a, b, mode=mode))
    want = np.convolve(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert got.shape == want.shape, f"{mode}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1, np.abs(want).max()))


@pytest.mark.parametrize("n1,n2", [(16, 16), (100, 17), (8, 60)])
def test_circular(rng, n1, n2):
    a = rng.standard_normal(n1).astype(np.float32)
    b = rng.standard_normal(n2).astype(np.float32)
    got = np.asarray(sp.fft_convolve(a, b, circular=True))
    period = max(n1, n2)
    want = _direct_circular(a.astype(np.float64), b.astype(np.float64), period)
    assert got.shape == (period,)
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1, np.abs(want).max()))


def test_complex_inputs(rng):
    a = (rng.standard_normal(40) + 1j * rng.standard_normal(40)).astype(np.complex64)
    b = (rng.standard_normal(12) + 1j * rng.standard_normal(12)).astype(np.complex64)
    got = np.asarray(sp.fft_convolve(a, b))
    want = np.convolve(a.astype(np.complex128), b.astype(np.complex128))
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_batched(rng):
    a = rng.standard_normal((4, 50)).astype(np.float32)
    b = rng.standard_normal((4, 11)).astype(np.float32)
    got = np.asarray(sp.fft_convolve(a, b))
    for i in range(4):
        want = np.convolve(a[i].astype(np.float64), b[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, atol=1e-4 * np.abs(want).max())


def test_correlate(rng):
    a = rng.standard_normal(30).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    got = np.asarray(sp.fft_correlate(a, b))
    want = np.correlate(a.astype(np.float64), b.astype(np.float64), mode="full")
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_identity_kernel(rng):
    a = rng.standard_normal(64).astype(np.float32)
    delta = np.zeros(1, np.float32)
    delta[0] = 1.0
    got = np.asarray(sp.fft_convolve(a, delta, mode="full"))
    np.testing.assert_allclose(got, a, atol=1e-5)


class TestOverlapAdd:
    def test_matches_direct(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        x = rng.standard_normal(10000).astype(np.float32)
        k = rng.standard_normal(33).astype(np.float32)
        for mode in ("full", "same", "valid"):
            got = np.asarray(sp.fft_oaconvolve(x, k, mode=mode))
            want = np.convolve(x.astype(np.float64), k, mode=mode)
            assert got.shape == want.shape, mode
            assert np.max(np.abs(got - want)) < 2e-3, mode

    def test_batched(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        x = rng.standard_normal((3, 5000)).astype(np.float32)
        k = rng.standard_normal(17).astype(np.float32)
        got = np.asarray(sp.fft_oaconvolve(x, k, mode="same"))
        for i in range(3):
            want = np.convolve(x[i].astype(np.float64), k, mode="same")
            assert np.max(np.abs(got[i] - want)) < 2e-3

    def test_kernel_longer_than_signal_falls_back(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        x = rng.standard_normal(16).astype(np.float32)
        k = rng.standard_normal(64).astype(np.float32)
        got = np.asarray(sp.fft_oaconvolve(x, k, mode="full"))
        want = np.convolve(x.astype(np.float64), k, mode="full")
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 2e-3

    def test_explicit_block(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        x = rng.standard_normal(2048).astype(np.float32)
        k = rng.standard_normal(5).astype(np.float32)
        got = np.asarray(sp.fft_oaconvolve(x, k, mode="full", block=128))
        want = np.convolve(x.astype(np.float64), k, mode="full")
        assert np.max(np.abs(got - want)) < 2e-3


class TestConvolve2D:
    def _oracle(self, a, k, mode):
        # direct 2-D convolution via numpy (small sizes)
        from numpy.lib.stride_tricks import sliding_window_view

        full = np.zeros((a.shape[0] + k.shape[0] - 1, a.shape[1] + k.shape[1] - 1))
        for i in range(k.shape[0]):
            for j in range(k.shape[1]):
                full[i : i + a.shape[0], j : j + a.shape[1]] += k[i, j] * a
        if mode == "full":
            return full
        if mode == "same":
            h = max(a.shape[0], k.shape[0]); w = max(a.shape[1], k.shape[1])
            si = (full.shape[0] - h) // 2; sj = (full.shape[1] - w) // 2
            return full[si : si + h, sj : sj + w]
        hi = min(a.shape[0], k.shape[0]) - 1
        wj = min(a.shape[1], k.shape[1]) - 1
        return full[hi : full.shape[0] - hi, wj : full.shape[1] - wj]

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_matches_direct(self, rng, mode):
        import mixed_radix_fast_fourier_transform_tpu as sp

        a = rng.standard_normal((24, 30)).astype(np.float32)
        k = rng.standard_normal((5, 7)).astype(np.float32)
        got = np.asarray(sp.fft_convolve2(a, k, mode=mode))
        want = self._oracle(a.astype(np.float64), k.astype(np.float64), mode)
        assert got.shape == want.shape, mode
        assert np.max(np.abs(got - want)) < 1e-3

    def test_batched(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        a = rng.standard_normal((2, 16, 16)).astype(np.float32)
        k = rng.standard_normal((1, 3, 3)).astype(np.float32)
        got = np.asarray(sp.fft_convolve2(a, k, mode="same"))
        assert got.shape == (2, 16, 16)
        want = self._oracle(a[0].astype(np.float64), k[0].astype(np.float64), "same")
        assert np.max(np.abs(got[0] - want)) < 1e-3

    def test_complex(self, rng):
        import mixed_radix_fast_fourier_transform_tpu as sp

        a = (rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))).astype(
            np.complex64
        )
        k = np.ones((2, 2), np.complex64)
        got = np.asarray(sp.fft_convolve2(a, k, mode="full"))
        assert got.shape == (9, 9)

    def test_1d_raises(self):
        import mixed_radix_fast_fourier_transform_tpu as sp

        with pytest.raises(ValueError):
            sp.fft_convolve2(np.zeros(8, np.float32), np.zeros((2, 2), np.float32))


class TestConvolveND:
    """fft_convolven vs scipy.signal.fftconvolve (exact scipy mode semantics,
    unlike fft_convolve's reference-pinned 1-D slicing)."""

    scipy = pytest.importorskip("scipy.signal")

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_3d_real(self, rng, mode):
        a = rng.standard_normal((6, 7, 8)).astype(np.float32)
        b = rng.standard_normal((3, 4, 5)).astype(np.float32)
        got = np.asarray(sp.fft_convolven(a, b, mode=mode))
        want = self.scipy.fftconvolve(a.astype(np.float64),
                                      b.astype(np.float64), mode=mode)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    @pytest.mark.parametrize("mode", ["full", "same"])
    def test_2d_complex(self, rng, mode):
        a = (rng.standard_normal((9, 10))
             + 1j * rng.standard_normal((9, 10))).astype(np.complex64)
        b = (rng.standard_normal((4, 6))
             + 1j * rng.standard_normal((4, 6))).astype(np.complex64)
        got = np.asarray(sp.fft_convolven(a, b, mode=mode))
        want = self.scipy.fftconvolve(a.astype(np.complex128),
                                      b.astype(np.complex128), mode=mode)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    def test_axes_subset_batched(self, rng):
        a = rng.standard_normal((4, 16, 17)).astype(np.float32)
        b = rng.standard_normal((4, 5, 6)).astype(np.float32)
        got = np.asarray(sp.fft_convolven(a, b, mode="same", axes=(1, 2)))
        want = self.scipy.fftconvolve(a.astype(np.float64),
                                      b.astype(np.float64), mode="same",
                                      axes=(1, 2))
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    def test_broadcast_kernel(self, rng):
        # lower-ndim kernel broadcasts like scipy's ndim requirement does NOT
        # allow; here it is explicitly supported by prepending axes
        a = rng.standard_normal((3, 10)).astype(np.float32)
        b = rng.standard_normal((4,)).astype(np.float32)
        got = np.asarray(sp.fft_convolven(a, b, mode="full", axes=1))
        want = np.stack([
            np.convolve(r.astype(np.float64), b.astype(np.float64)) for r in a
        ])
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    def test_valid_shape_error(self, rng):
        with pytest.raises(ValueError):
            sp.fft_convolven(rng.standard_normal((5, 3)),
                             rng.standard_normal((3, 5)), mode="valid")

    def test_jittable(self, rng):
        import jax
        a = rng.standard_normal((6, 7)).astype(np.float32)
        b = rng.standard_normal((3, 3)).astype(np.float32)
        got = np.asarray(jax.jit(
            lambda u, v: sp.fft_convolven(u, v, mode="same"))(a, b))
        want = self.scipy.fftconvolve(a.astype(np.float64),
                                      b.astype(np.float64), mode="same")
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5
