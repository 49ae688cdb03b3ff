"""Wavelet scattering: invariance, stability, second-order discrimination."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _feats(x, **kw):
    s0, s1, s2, _ = sp.scattering1d(x, **kw)
    return np.concatenate([
        np.asarray(s0).ravel(), np.asarray(s1).ravel(),
        np.asarray(s2).ravel(),
    ])


class TestScattering:
    def test_shapes_and_meta(self, rng):
        x = rng.standard_normal(2048).astype(np.float32)
        s0, s1, s2, (xi1, xi2, pairs) = sp.scattering1d(x, J=5, Q=4)
        st = 1 << 4
        assert np.asarray(s0).shape == (2048 // st,)
        assert np.asarray(s1).shape == (len(xi1), 2048 // st)
        assert np.asarray(s2).shape == (len(pairs), 2048 // st)
        assert all(xi2[j2] < xi1[j1] for j1, j2 in pairs)

    def test_translation_invariance(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        f_ref = _feats(x, J=6, Q=4)
        f_shift = _feats(np.roll(x, 13), J=6, Q=4)
        rel = np.linalg.norm(f_ref - f_shift) / np.linalg.norm(f_ref)
        assert rel < 0.05, rel  # shift << 2^J: near-invariant

    def test_second_order_separates_am_rates(self):
        # same carrier, same average spectrum envelope scale — different
        # modulation rates are a second-order property
        T = 4096
        t = np.arange(T)
        carrier = np.sin(2 * np.pi * 0.25 * t)
        slow = (1 + 0.9 * np.sin(2 * np.pi * 0.004 * t)) * carrier
        fast = (1 + 0.9 * np.sin(2 * np.pi * 0.02 * t)) * carrier
        _, s1a, s2a, _ = sp.scattering1d(slow.astype(np.float32), J=6, Q=2)
        _, s1b, s2b, _ = sp.scattering1d(fast.astype(np.float32), J=6, Q=2)
        d1 = np.linalg.norm(np.asarray(s1a) - np.asarray(s1b)) / \
            np.linalg.norm(np.asarray(s1a))
        d2 = np.linalg.norm(np.asarray(s2a) - np.asarray(s2b)) / \
            np.linalg.norm(np.asarray(s2a))
        assert d2 > 2.0 * d1, (d1, d2)

    def test_batch_jit_errors(self, rng):
        import jax

        xb = rng.standard_normal((2, 1024)).astype(np.float32)
        s0, s1, s2, _ = jax.jit(
            lambda v: sp.scattering1d(v, J=4, Q=2)[:3]
        )(xb) + (None,)
        assert np.asarray(s1).shape[0] == 2
        with pytest.raises(ValueError):
            sp.scattering1d(np.zeros(16, np.float32), J=6)
        with pytest.raises(ValueError):
            sp.scattering1d(np.zeros(1024, np.complex64))
        with pytest.raises(ValueError):
            sp.scattering1d(np.zeros(1000, np.float32), J=4, stride=16)
