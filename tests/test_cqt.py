"""Constant-Q transform: dense fp64 matched-filter oracle, Q-constancy,
peak localization, batching/jit, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.ops.cqt import _cqt_kernel_time
from mixed_radix_fast_fourier_transform_tpu.utils.factorize import next_pow2


def _dense_cqt(x, fs, fmin, n_bins, B, hop, window="hann", filter_scale=1.0):
    """fp64 time-domain matched filters — the definition, computed directly."""
    freqs = sp.cqt_frequencies(n_bins, fmin, B)
    kernels = _cqt_kernel_time(fs, freqs, B, window, filter_scale)
    nf = next_pow2(max(k.size for k in kernels))
    xp = np.concatenate([np.zeros(nf // 2), x, np.zeros(nf // 2)])
    if xp.size < nf:
        xp = np.concatenate([xp, np.zeros(nf - xp.size)])
    n_frames = 1 + (xp.size - nf) // hop
    out = np.zeros((n_frames, n_bins), np.complex128)
    for t in range(n_frames):
        fr = xp[t * hop : t * hop + nf]
        for k, g in enumerate(kernels):
            s = (nf - g.size) // 2
            out[t, k] = np.sum(fr[s : s + g.size] * np.conj(g))
    return out


def test_matches_dense_oracle(rng):
    fs = 8000.0
    x = rng.standard_normal(4096)
    got = np.asarray(
        sp.cqt(x.astype(np.float32), fs=fs, fmin=55.0, n_bins=48, hop=256)
    )
    want = _dense_cqt(x, fs, 55.0, 48, 12, 256)
    assert got.shape == want.shape
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_matches_oracle_other_window_scale(rng):
    fs = 4000.0
    x = rng.standard_normal(2048)
    got = np.asarray(
        sp.cqt(
            x.astype(np.float32), fs=fs, fmin=40.0, n_bins=36,
            bins_per_octave=9, hop=128, window="hamming", filter_scale=2.0,
        )
    )
    want = _dense_cqt(x, fs, 40.0, 36, 9, 128, "hamming", 2.0)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_sinusoid_peaks_at_its_band(rng):
    fs, fmin, n_bins, B = 8000.0, 55.0, 48, 12
    freqs = sp.cqt_frequencies(n_bins, fmin, B)
    for k in (10, 25, 40):
        sig = np.cos(
            2 * np.pi * freqs[k] * np.arange(8192) / fs
        ).astype(np.float32)
        C = np.abs(np.asarray(sp.cqt(sig, fs=fs, fmin=fmin, n_bins=n_bins,
                                     hop=512)))
        mid = C[C.shape[0] // 2]
        assert int(mid.argmax()) == k


def test_constant_q_bandwidth(rng):
    """Response half-width (in bins) of a pure tone is ~constant across the
    ladder — the defining property."""
    fs, fmin, n_bins, B = 8000.0, 55.0, 48, 12
    freqs = sp.cqt_frequencies(n_bins, fmin, B)
    widths = []
    for k in (12, 24, 36):
        sig = np.cos(2 * np.pi * freqs[k] * np.arange(16384) / fs)
        C = np.abs(np.asarray(sp.cqt(sig.astype(np.float32), fs=fs,
                                     fmin=fmin, n_bins=n_bins, hop=512)))
        mid = C[C.shape[0] // 2]
        widths.append(int(np.sum(mid > 0.5 * mid.max())))
    assert max(widths) - min(widths) <= 1, widths


def test_batch_jit_complex(rng):
    import jax
    import jax.numpy as jnp

    fs = 4000.0
    xb = rng.standard_normal((2, 3, 1500)).astype(np.float32)
    f = jax.jit(lambda v: sp.cqt(v, fs=fs, fmin=60.0, n_bins=24, hop=200))
    got = np.asarray(f(jnp.asarray(xb)))
    single = np.asarray(
        sp.cqt(xb[1, 2], fs=fs, fmin=60.0, n_bins=24, hop=200)
    )
    assert got.shape[:2] == (2, 3)
    assert np.abs(got[1, 2] - single).max() < 1e-6
    xc = (rng.standard_normal(1500) + 1j * rng.standard_normal(1500))
    gc = np.asarray(
        sp.cqt(xc.astype(np.complex64), fs=fs, fmin=60.0, n_bins=24, hop=200)
    )
    assert gc.shape == single.shape


def test_frequencies_and_errors():
    f = sp.cqt_frequencies(13, 100.0, 12)
    assert np.allclose(f[12] / f[0], 2.0)
    with pytest.raises(ValueError):
        sp.cqt(np.ones(100, np.float32), fs=1000.0, fmin=400.0, n_bins=24)
    with pytest.raises(ValueError):
        sp.cqt(np.ones(100, np.float32), hop=0)
    with pytest.raises(ValueError):
        sp.cqt(np.zeros(0, np.float32))
    with pytest.raises(ValueError):
        sp.cqt_frequencies(0, 100.0)
    with pytest.raises(ValueError):
        sp.cqt(np.ones(100, np.float32), fs=1000.0, fmin=50.0, n_bins=8,
               n_fft=16)


class TestInverseCqt:
    def test_tone_reconstruction(self, rng):
        fs = 8000.0
        freqs = sp.cqt_frequencies(48, 55.0, 12)
        n = 16384
        t = np.arange(n) / fs
        sig = (np.cos(2 * np.pi * freqs[20] * t)
               + 0.5 * np.cos(2 * np.pi * freqs[35] * t)).astype(np.float32)
        kw = dict(fs=fs, fmin=55.0, hop=256)
        C = np.asarray(sp.cqt(sig, n_bins=48, **kw))
        y = np.asarray(sp.icqt(C, length=n, **kw))
        sl = slice(2000, n - 2000)
        corr = np.corrcoef(y[sl], sig[sl])[0, 1]
        assert corr > 0.93, corr
        # Landweber refinement improves the fit, jitted end to end
        import jax

        y5 = np.asarray(jax.jit(
            lambda c: sp.icqt(c, length=n, n_iter=5, **kw)
        )(C))
        corr5 = np.corrcoef(y5[sl], sig[sl])[0, 1]
        assert corr5 > corr

    def test_batched_shapes(self, rng):
        fs = 4000.0
        x = rng.standard_normal((2, 4096)).astype(np.float32)
        C = np.asarray(sp.cqt(x, fs=fs, fmin=60.0, n_bins=24, hop=256))
        y = np.asarray(sp.icqt(C, fs=fs, fmin=60.0, n_bins=24, hop=256,
                               length=4096))
        assert y.shape == (2, 4096)
        assert np.isfinite(y).all()

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.icqt(np.ones(5, np.complex64))
        with pytest.raises(ValueError):
            sp.icqt(np.ones((3, 24), np.complex64), fs=1000.0, fmin=400.0)
        with pytest.raises(ValueError):
            sp.icqt(np.ones((3, 24), np.complex64), hop=0)
        with pytest.raises(ValueError):
            sp.icqt(np.ones((3, 24), np.complex64),
                    window=np.ones(7, np.float32))
