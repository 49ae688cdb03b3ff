"""Radon/iradon: analytic disk projections, geometry pinning, FBP
round trip."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


def _disk(n, cx=0.0, cy=0.0, r=None, value=1.0):
    r = n / 5 if r is None else r
    y, x = np.mgrid[:n, :n].astype(np.float64) - n // 2
    return (value * ((x - cx) ** 2 + (y - cy) ** 2 <= r * r)).astype(
        np.float32
    )


class TestRadon:
    def test_disk_projection_is_analytic(self):
        n, r = 128, 25.0
        img = _disk(n, r=r)
        theta = np.linspace(0, np.pi, 8, endpoint=False)
        sino = np.asarray(sp.radon(img, theta))
        s = np.arange(n) - n // 2
        want = 2.0 * np.sqrt(np.maximum(r * r - s * s, 0.0))
        for t in range(8):  # rotation-invariant phantom: every angle equal
            err = np.abs(sino[t] - want)
            # band-limited ringing at the edges; compare in L2
            assert np.linalg.norm(err) / np.linalg.norm(want) < 0.06, t

    def test_offcenter_shift_pins_geometry(self):
        n = 96
        dx, dy = 17.0, -9.0
        img = _disk(n, cx=dx, cy=dy, r=8.0)
        theta = np.array([0.0, np.pi / 2, np.pi / 4])
        sino = np.asarray(sp.radon(img, theta))
        s = np.arange(n) - n // 2
        for t, th in enumerate(theta):
            s_peak = s[np.argmax(sino[t])]
            want = dx * np.cos(th) + dy * np.sin(th)
            assert abs(s_peak - want) <= 1.5, (th, s_peak, want)

    def test_mass_conservation(self):
        # every projection integrates to the image mass
        img = _disk(64, cx=5.0, cy=-3.0, r=10.0)
        sino = np.asarray(sp.radon(img, np.linspace(0, np.pi, 12,
                                                    endpoint=False)))
        mass = img.sum()
        assert np.max(np.abs(sino.sum(-1) - mass)) / mass < 1e-3

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.radon(np.zeros((8, 6), np.float32))
        with pytest.raises(ValueError):
            sp.radon(np.zeros((64, 64), np.float32), theta=np.zeros((2, 2)))
        with pytest.raises(ValueError):
            sp.iradon(np.zeros((4, 64), np.float32), theta=np.zeros(3))
        with pytest.raises(ValueError):
            sp.iradon(np.zeros((4, 64), np.float32), filter_name="box")


class TestIradon:
    @pytest.mark.parametrize("filter_name", ["ramp", "hann", "shepp-logan"])
    def test_fbp_roundtrip(self, filter_name):
        n = 96
        img = _disk(n, cx=10.0, cy=4.0, r=14.0) \
            + 0.5 * _disk(n, cx=-18.0, cy=-12.0, r=9.0)
        theta = np.linspace(0, np.pi, 120, endpoint=False)
        sino = sp.radon(img, theta)
        rec = np.asarray(sp.iradon(sino, theta, filter_name=filter_name))
        assert rec.shape == img.shape
        corr = np.corrcoef(rec.ravel(), img.ravel())[0, 1]
        assert corr > 0.93, (filter_name, corr)

    @pytest.mark.slow  # 180-angle FBP at n=96; the default lane keeps the
    # ramp roundtrip + batch_jit correlation checks
    def test_quantitative_interior(self):
        n = 96
        img = _disk(n, r=20.0)
        theta = np.linspace(0, np.pi, 180, endpoint=False)
        rec = np.asarray(sp.iradon(sp.radon(img, theta), theta))
        y, x = np.mgrid[:n, :n] - n // 2
        interior = (x * x + y * y) <= 10.0**2
        assert abs(float(rec[interior].mean()) - 1.0) < 0.08

    def test_batch_jit(self):
        import jax

        imgs = np.stack([_disk(48, r=8.0), _disk(48, cx=6.0, r=8.0)])
        theta = np.linspace(0, np.pi, 24, endpoint=False)
        f = jax.jit(lambda v: sp.iradon(sp.radon(v, theta), theta))
        rec = np.asarray(f(imgs))
        assert rec.shape == imgs.shape
        assert np.corrcoef(rec[1].ravel(), imgs[1].ravel())[0, 1] > 0.85
