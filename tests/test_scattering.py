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


class TestScattering2D:
    def test_shapes_and_invariance(self, rng):
        img = rng.standard_normal((64, 64)).astype(np.float32)
        s0, s1, s2, (meta1, pairs) = sp.scattering2d(img, J=3, L=4)
        st = 4
        assert np.asarray(s0).shape == (16, 16)
        assert np.asarray(s1).shape == (12, 16, 16)
        assert np.asarray(s2).shape == (len(pairs), 16, 16)
        # translation invariance: a 3-pixel shift barely moves features
        f0 = np.concatenate([np.asarray(v).ravel() for v in (s0, s1, s2)])
        sh = np.roll(np.roll(img, 3, 0), 2, 1)
        a0, a1, a2, _ = sp.scattering2d(sh, J=3, L=4)
        f1 = np.concatenate([np.asarray(v).ravel() for v in (a0, a1, a2)])
        assert np.linalg.norm(f0 - f1) / np.linalg.norm(f0) < 0.1

    def test_rotation_permutes_orientations(self, rng):
        # rotating the image 90° permutes the L orientation channels
        img = rng.standard_normal((64, 64)).astype(np.float32)
        _, s1, _, (meta1, _) = sp.scattering2d(img, J=2, L=4)
        _, s1r, _, _ = sp.scattering2d(np.rot90(img).copy(), J=2, L=4)
        m1 = np.asarray(s1).mean((-2, -1))   # (J*L,) channel means
        m1r = np.asarray(s1r).mean((-2, -1))
        # orientation l maps to (l + L/2) mod L under 90° rotation
        L = 4
        for ch, (j, l) in enumerate(meta1):
            partner = [i for i, (jj, ll) in enumerate(meta1)
                       if jj == j and ll == (l + L // 2) % L][0]
            assert abs(m1r[ch] - m1[partner]) / (abs(m1[partner]) + 1e-9) \
                < 0.05, (ch, partner)

    def test_oriented_texture_discrimination(self):
        # vertical vs horizontal stripes: same power, different orientation
        y, x = np.mgrid[:64, :64]
        v = np.sin(2 * np.pi * x / 8).astype(np.float32)
        h = np.sin(2 * np.pi * y / 8).astype(np.float32)
        _, s1v, _, (meta1, _) = sp.scattering2d(v, J=3, L=4)
        _, s1h, _, _ = sp.scattering2d(h, J=3, L=4)
        mv = np.asarray(s1v).mean((-2, -1))
        mh = np.asarray(s1h).mean((-2, -1))
        # the dominant channel differs and has different orientation index
        lv = meta1[int(np.argmax(mv))][1]
        lh = meta1[int(np.argmax(mh))][1]
        assert lv != lh

    def test_bank_periodized(self):
        # j=0 filter (center 3π/4, spectral std 1.25 rad): at ω_x = -π the
        # wrapped alias sits π/4 away (≈0.82 of peak) while the truncated
        # principal-grid Gaussian is ~6e-5 — periodization must carry the
        # tail across the wrap (ADVICE r3)
        from mixed_radix_fast_fourier_transform_tpu.ops.scattering import (
            _scattering_bank_2d,
        )

        psis, phi, meta = _scattering_bank_2d(64, 64, 1, 1)
        assert meta[0] == (0, 0)  # l=0: center on the +x axis
        assert psis[0][0, 32] > 0.5  # value at (ω_y=0, ω_x=-π)
        # DC correction survives periodization
        assert abs(psis[0][0, 0]) < 1e-12

    def test_errors(self, rng):
        with pytest.raises(ValueError):
            sp.scattering2d(np.zeros(64, np.float32))
        with pytest.raises(ValueError):
            sp.scattering2d(np.zeros((8, 8), np.float32), J=3)
        with pytest.raises(ValueError):
            sp.scattering2d(np.zeros((64, 64), np.complex64))
