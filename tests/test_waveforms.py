"""Waveform generators vs the scipy.signal oracle."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp

ss = pytest.importorskip("scipy.signal")


@pytest.fixture
def t():
    return np.linspace(0, 2.0, 5001)


class TestGenerators:
    @pytest.mark.parametrize("method", ["linear", "quadratic",
                                        "logarithmic", "hyperbolic"])
    def test_chirp(self, t, method):
        kw = dict(f0=10.0, t1=2.0, f1=120.0, method=method, phi=30.0)
        got = np.asarray(sp.chirp(t.astype(np.float64), **kw))
        want = ss.chirp(t, **kw)
        assert np.max(np.abs(got - want)) < 1e-6, method

    def test_chirp_quadratic_vertex(self, t):
        got = np.asarray(sp.chirp(t, 10.0, 2.0, 120.0, "quadratic",
                                  vertex_zero=False))
        want = ss.chirp(t, 10.0, 2.0, 120.0, "quadratic", vertex_zero=False)
        assert np.max(np.abs(got - want)) < 1e-5

    def test_sweep_poly(self, t):
        poly = [0.05, -0.75, 2.5, 5.0]
        got = np.asarray(sp.sweep_poly(t.astype(np.float64), poly, phi=12.0))
        want = ss.sweep_poly(t, np.poly1d(poly), phi=12.0)
        assert np.max(np.abs(got - want)) < 1e-6

    def test_gausspulse(self):
        t = np.linspace(-0.01, 0.01, 2001)
        yi, yq, ye = sp.gausspulse(t, fc=1500.0, bw=0.6, retquad=True,
                                   retenv=True)
        wi, wq, we = ss.gausspulse(t, fc=1500.0, bw=0.6, retquad=True,
                                   retenv=True)
        for g, w in ((yi, wi), (yq, wq), (ye, we)):
            assert np.max(np.abs(np.asarray(g) - w)) < 1e-6
        assert abs(sp.gausspulse("cutoff", fc=1500.0, bw=0.6)
                   - ss.gausspulse("cutoff", fc=1500.0, bw=0.6)) < 1e-12

    @pytest.mark.parametrize("width", [0.0, 0.3, 0.5, 1.0])
    def test_sawtooth(self, t, width):
        got = np.asarray(sp.sawtooth(20 * t, width))
        want = ss.sawtooth(20 * t, width)
        # grid points can straddle the discontinuity; compare off-jump
        ok = np.abs(got - want) < 1e-6
        assert ok.mean() > 0.999, width

    @pytest.mark.parametrize("duty", [0.2, 0.5, 0.8])
    def test_square(self, t, duty):
        got = np.asarray(sp.square(20 * t, duty))
        want = ss.square(20 * t, duty)
        ok = np.abs(got - want) < 1e-6
        assert ok.mean() > 0.999, duty

    def test_unit_impulse(self):
        np.testing.assert_array_equal(
            np.asarray(sp.unit_impulse(7)), ss.unit_impulse(7))
        np.testing.assert_array_equal(
            np.asarray(sp.unit_impulse(7, "mid")), ss.unit_impulse(7, "mid"))
        np.testing.assert_array_equal(
            np.asarray(sp.unit_impulse((4, 5), (1, 2))),
            ss.unit_impulse((4, 5), (1, 2)))

    def test_pipeline_and_errors(self):
        # generator feeds the library's own analysis under jit
        import jax

        fs = 8000.0
        tt = np.arange(8192) / fs
        x = np.asarray(jax.jit(
            lambda v: sp.chirp(v, 100.0, 8192 / fs, 2000.0)
        )(tt.astype(np.float32)))
        E, freqs = sp.reassigned_spectrogram(x, nperseg=256)
        m = np.asarray(E).shape[0] // 2
        f_mid = 100.0 + (2000.0 - 100.0) * (m * 32) / 8192
        k = int(np.argmax(np.asarray(E)[m]))
        assert abs(freqs[k] * fs - f_mid) < 60.0
        with pytest.raises(ValueError):
            sp.chirp(tt, 10.0, -1.0, 100.0)
        with pytest.raises(ValueError):
            sp.chirp(tt, 10.0, 1.0, 100.0, method="sideways")
        with pytest.raises(ValueError):
            sp.sawtooth(tt, 1.5)
        with pytest.raises(ValueError):
            sp.gausspulse(tt, fc=-1.0)
