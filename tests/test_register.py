"""Subpixel registration: fourier_shift roundtrips, integer + subpixel
recovery, error metric, batching/jit, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((128, 128))
    f = np.fft.fftfreq(128)
    k = np.exp(-0.5 * ((f[:, None] ** 2 + f[None, :] ** 2) / 0.08 ** 2))
    im = np.real(np.fft.ifft2(np.fft.fft2(base) * k))
    return (im / np.abs(im).max()).astype(np.float32)


def test_fourier_shift_integer_matches_roll(img):
    got = np.asarray(sp.fourier_shift(img, np.array([3.0, -5.0], np.float32)))
    want = np.roll(img, (3, -5), axis=(0, 1))
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("true", [(5.0, -3.0), (2.25, -7.6), (-0.3, 0.45)])
def test_subpixel_recovery_and_realign(img, true):
    mov = np.asarray(sp.fourier_shift(img, np.array(true, np.float32)))
    sh, err = sp.phase_cross_correlation(img, mov, upsample_factor=20)
    sh = np.asarray(sh)
    assert np.abs(sh + np.array(true)).max() < 0.05  # align-shift = -displacement
    assert float(np.asarray(err)) < 1e-3
    back = np.asarray(sp.fourier_shift(mov, sh))
    assert np.abs(back - img).max() / np.abs(img).max() < 1e-4


def test_integer_mode(img):
    mov = np.roll(img, (4, -6), axis=(0, 1))
    sh, _ = sp.phase_cross_correlation(img, mov)
    assert tuple(np.asarray(sh)) == (-4.0, 6.0)


def test_error_metric_rises_with_noise(img):
    rng = np.random.default_rng(1)
    mov = np.asarray(sp.fourier_shift(img, np.array([1.5, -2.0], np.float32)))
    _, e_clean = sp.phase_cross_correlation(img, mov, upsample_factor=10)
    noisy = mov + 0.1 * rng.standard_normal(img.shape).astype(np.float32)
    sh, e_noisy = sp.phase_cross_correlation(img, noisy, upsample_factor=10)
    assert float(np.asarray(e_noisy)) > float(np.asarray(e_clean))
    assert np.abs(np.asarray(sh) + np.array([1.5, -2.0])).max() < 0.5


def test_batch_jit_and_normalization(img):
    import jax

    movs = np.stack([
        np.asarray(sp.fourier_shift(img, np.array(s, np.float32)))
        for s in [(1.5, 2.0), (-3.25, 0.75)]
    ])
    refs = np.stack([img, img])
    sh, err = jax.jit(
        lambda a, b: sp.phase_cross_correlation(a, b, upsample_factor=8)
    )(refs, movs)
    sh = np.asarray(sh)
    assert sh.shape == (2, 2)
    assert np.abs(sh[0] + [1.5, 2.0]).max() < 0.13
    assert np.abs(sh[1] + [-3.25, 0.75]).max() < 0.13
    # plain correlation mode also works on this clean pair
    sh2, _ = sp.phase_cross_correlation(img, movs[0], upsample_factor=8,
                                        normalization=None)
    assert np.abs(np.asarray(sh2) + [1.5, 2.0]).max() < 0.13


def test_errors(img):
    with pytest.raises(ValueError):
        sp.phase_cross_correlation(img, img[:64])
    with pytest.raises(ValueError):
        sp.phase_cross_correlation(img, img, upsample_factor=0)
    with pytest.raises(ValueError):
        sp.phase_cross_correlation(img, img, normalization="l2")
    with pytest.raises(ValueError):
        sp.fourier_shift(np.ones(8, np.float32), np.zeros(2))
    with pytest.raises(ValueError):
        sp.fourier_shift(img, np.zeros(3))


class TestUnwrapPhase2D:
    def test_recovers_smooth_surface(self, rng):
        H, W = 96, 128
        yy, xx = np.mgrid[0:H, 0:W]
        true = (18.0 * np.exp(-(((yy - 40) / 30.0) ** 2
                                + ((xx - 60) / 40.0) ** 2))
                + 0.08 * yy + 0.05 * xx)
        wrapped = np.angle(np.exp(1j * true)).astype(np.float32)
        un = np.asarray(sp.unwrap_phase_2d(wrapped))
        diff = un - (true - true.mean())
        assert np.abs(diff - diff.mean()).max() < 1e-3

    def test_batch_jit_and_noise(self, rng):
        import jax

        H, W = 64, 64
        yy, xx = np.mgrid[0:H, 0:W]
        true = 0.2 * yy + 0.15 * xx
        wrapped = np.angle(
            np.exp(1j * (true + 0.05 * rng.standard_normal((H, W))))
        ).astype(np.float32)
        batch = np.stack([wrapped, wrapped])
        un = np.asarray(jax.jit(sp.unwrap_phase_2d)(batch))
        assert un.shape == (2, H, W)
        diff = un[0] - (true - true.mean())
        assert np.abs(diff - diff.mean()).max() < 0.3  # noise-limited

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.unwrap_phase_2d(np.ones(8, np.float32))
        with pytest.raises(ValueError):
            sp.unwrap_phase_2d(np.ones((4, 4), np.complex64))
