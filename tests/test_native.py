"""Native C++ planner/oracle (native/): build, parity vs pure Python, oracle
accuracy vs numpy.fft.  Skipped wholesale when the shared library isn't built
(the package must work identically without it)."""

import os

import numpy as np
import pytest

from mixed_radix_fast_fourier_transform_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestPlannerParity:
    @pytest.mark.parametrize("n", [1, 2, 12, 360, 1024, 5040, 65536, 2 * 3 * 5 * 7 * 11 * 13])
    def test_prime_factors(self, n):
        from mixed_radix_fast_fourier_transform_tpu.utils.factorize import prime_factors

        want = []
        m = n
        for p in range(2, m + 1):
            while m % p == 0:
                want.append(p)
                m //= p
            if m == 1:
                break
        assert native.prime_factors(n) == (want or [])
        assert prime_factors(n) == (want or [])

    @pytest.mark.parametrize("n", [2, 360, 1024, 5040, 65536, 97 * 4])
    def test_plan_stages_matches_python_greedy(self, n):
        # the native planner implements the "greedy" strategy; compare against
        # the pure-python greedy implementation
        from mixed_radix_fast_fourier_transform_tpu.utils.factorize import (
            _plan_stages_greedy,
        )

        try:
            want = _plan_stages_greedy(n, 64)
        except ValueError:
            with pytest.raises(ValueError):
                native.plan_stages(n, 64)
            return
        assert native.plan_stages(n, 64) == want

    def test_is_smooth(self):
        from mixed_radix_fast_fourier_transform_tpu.utils import native as nat

        lib = nat._load()
        assert lib.spectral_is_smooth(360, 7) == 1
        assert lib.spectral_is_smooth(360 * 11, 7) == 0
        assert lib.spectral_is_smooth(0, 7) == -1


class TestTwiddleParity:
    def test_dft_matrix(self):
        re, im = native.dft_matrix(12, -1)
        k = np.arange(12)
        w = np.exp(-2j * np.pi * np.outer(k, k) / 12)
        # direct np.exp doesn't reduce the phase mod n; allow its error
        assert np.max(np.abs(re - w.real)) < 1e-13
        assert np.max(np.abs(im - w.imag)) < 1e-13

    def test_split_twiddles(self):
        re, im = native.split_twiddles(8, 16, -1)
        j, k = np.arange(8)[:, None], np.arange(16)[None, :]
        w = np.exp(-2j * np.pi * j * k / 128)
        assert np.max(np.abs(re - w.real)) < 1e-14

    def test_chirp(self):
        re, im = native.chirp(1009, 1009, 1)
        j = np.arange(1009, dtype=np.int64)
        w = np.exp(1j * np.pi * ((j * j) % 2018).astype(float) / 1009)
        assert np.max(np.abs(re - w.real)) < 1e-13
        assert np.max(np.abs(im - w.imag)) < 1e-13

    def test_real_split(self):
        re, im = native.real_split_twiddles(64, -1)
        assert re.shape == (33,)
        k = np.arange(33)
        w = np.exp(-2j * np.pi * k / 64)
        assert np.max(np.abs(re - w.real)) < 1e-15


class TestOracle:
    @pytest.mark.parametrize("n", [1, 2, 13, 64, 257, 360, 1009, 1024, 5040])
    def test_forward_vs_numpy(self, rng, n):
        x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n)))
        got = native.oracle_fft(x, -1)
        want = np.fft.fft(x, axis=-1)
        assert np.max(np.abs(got - want)) / max(1.0, np.max(np.abs(want))) < 1e-11

    def test_inverse_unnormalized(self, rng):
        n = 360
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        got = native.oracle_fft(x, 1)
        want = np.fft.ifft(x) * n
        assert np.max(np.abs(got - want)) < 1e-9

    def test_bad_args(self):
        with pytest.raises(ValueError):
            native.oracle_fft(np.zeros(0, np.complex128).reshape(1, 0), -1)


class TestPaddedLengths:
    def test_next_fast_len_parity(self):
        from mixed_radix_fast_fourier_transform_tpu.utils.factorize import (
            next_pow2,
        )

        def py_next_fast(n, primes=(2, 3, 5, 7)):
            if n <= 1:
                return 1
            best = next_pow2(n)
            m = n
            while m < best:
                v = m
                for p in primes:
                    while v % p == 0:
                        v //= p
                if v == 1:
                    return m
                m += 1
            return best

        for n in list(range(1, 200)) + [1009, 4127, 65537, 100003]:
            assert native.next_fast_len(n) == py_next_fast(n), n

    def test_next_splittable_parity(self):
        # compare against the closed form computed in pure Python (the
        # factorize entry point itself routes through the native path, so it
        # cannot serve as an independent oracle here)
        from mixed_radix_fast_fourier_transform_tpu.utils.factorize import (
            next_pow2,
        )

        def py_next_fast(n):
            if n <= 1:
                return 1
            best = next_pow2(n)
            m = n
            while m < best:
                v = m
                for q in (2, 3, 5, 7):
                    while v % q == 0:
                        v //= q
                if v == 1:
                    return m
                m += 1
            return best

        for n in [7, 100, 4128, 65535, 100003]:
            for p in (1, 2, 4, 8):
                want = p * p * py_next_fast(-(-n // (p * p)))
                assert native.next_splittable_len(n, p, 256) == want, (n, p)
        with pytest.raises(ValueError):
            native.next_splittable_len(100, 257, 256)


def test_native_prev_fast_len_parity():
    from mixed_radix_fast_fourier_transform_tpu.utils import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    for n in [1, 7, 11, 13, 100, 1009, 5041, 65537]:
        import os

        os.environ["SPECTRAL_NO_NATIVE"] = "1"
        try:
            from mixed_radix_fast_fourier_transform_tpu.utils.factorize import (
                _use_native,
            )

            _use_native.cache_clear()
            import mixed_radix_fast_fourier_transform_tpu as sp

            want = sp.prev_fast_len(n)
        finally:
            del os.environ["SPECTRAL_NO_NATIVE"]
            _use_native.cache_clear()
        assert native.prev_fast_len(n) == want, n
