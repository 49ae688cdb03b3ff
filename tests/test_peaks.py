"""Peak analysis + rank filters + CZT/ZoomFFT classes — scipy oracles."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture(scope="module")
def walk():
    return np.cumsum(np.random.default_rng(3).standard_normal(1500))


class TestFindPeaks:
    @pytest.mark.parametrize("kwargs", [
        {}, {"height": 0.0}, {"threshold": 0.1}, {"distance": 25},
        {"prominence": 1.0}, {"width": 3.0},
        {"prominence": (0.5, 8.0), "wlen": 101},
        {"width": (2, 20), "rel_height": 0.7},
        {"height": 0.5, "distance": 10, "prominence": 0.5, "width": 2},
    ], ids=lambda k: "-".join(k) or "bare")
    def test_vs_scipy(self, walk, kwargs):
        gp, gprops = sp.find_peaks(walk, **kwargs)
        wp, wprops = scipy_signal.find_peaks(walk, **kwargs)
        assert np.array_equal(gp, wp)
        assert set(gprops) == set(wprops)
        for k in wprops:
            assert np.allclose(gprops[k], wprops[k], atol=1e-10)

    def test_plateaus(self):
        x = np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0, 1, 0], float)
        gp, _ = sp.find_peaks(x, plateau_size=(2, None))
        wp, _ = scipy_signal.find_peaks(x, plateau_size=(2, None))
        assert np.array_equal(gp, wp)

    def test_prominences_and_widths(self, walk):
        peaks, _ = scipy_signal.find_peaks(walk)
        for args in [(), (51,)]:
            g = sp.peak_prominences(walk, peaks, *args)
            w = scipy_signal.peak_prominences(walk, peaks, *args)
            for a, b in zip(g, w):
                assert np.allclose(a, b)
        g = sp.peak_widths(walk, peaks, rel_height=1.0)
        w = scipy_signal.peak_widths(walk, peaks, rel_height=1.0)
        for a, b in zip(g, w):
            assert np.allclose(a, b)

    def test_argrel(self):
        d = np.random.default_rng(5).standard_normal(400)
        assert np.array_equal(sp.argrelmax(d, order=3)[0],
                              scipy_signal.argrelmax(d, order=3)[0])
        assert np.array_equal(
            sp.argrelmin(d, order=2, mode="wrap")[0],
            scipy_signal.argrelmin(d, order=2, mode="wrap")[0])

    def test_errors(self):
        with pytest.raises(ValueError):
            sp.find_peaks(np.zeros((3, 3)))
        with pytest.raises(ValueError):
            sp.find_peaks(np.zeros(8), distance=0)
        with pytest.raises(ValueError):
            sp.peak_prominences(np.zeros(8), [10])


class TestRankFilters:
    def test_medfilt_1d(self, rng):
        x = rng.standard_normal(200).astype(np.float32)
        got = np.asarray(sp.medfilt(x, 5))
        want = scipy_signal.medfilt(x, 5)
        assert np.allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("k", [3, (5, 3)])
    def test_medfilt2d(self, rng, k):
        x = rng.standard_normal((40, 30)).astype(np.float32)
        got = np.asarray(sp.medfilt(x, k))
        want = scipy_signal.medfilt(x, k)
        assert np.allclose(got, want, atol=1e-6)

    def test_order_filter(self, rng):
        x = rng.standard_normal((30, 30)).astype(np.float32)
        dom = np.ones((3, 3))
        dom[0, 0] = 0
        got = np.asarray(sp.order_filter(x, dom, 2))
        want = scipy_signal.order_filter(x, dom, 2)
        assert np.allclose(got, want, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            sp.medfilt(np.zeros(16), 4)  # even kernel
        with pytest.raises(ValueError):
            sp.order_filter(np.zeros((4, 4)), np.ones((3, 3)), 9)  # bad rank


class TestCZTClasses:
    def test_czt_class(self, rng):
        x = (rng.standard_normal(120) + 1j * rng.standard_normal(120)
             ).astype(np.complex64)
        w0, a0 = np.exp(-2j * np.pi / 200), np.exp(1j * 0.3)
        mine = sp.CZT(120, 60, w=w0, a=a0)
        ref = scipy_signal.CZT(120, 60, w=w0, a=a0)
        got, want = np.asarray(mine(x)), ref(x)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5
        assert np.allclose(mine.points(), ref.points())

    def test_zoom_fft_class(self, rng):
        x = (rng.standard_normal(120) + 1j * rng.standard_normal(120)
             ).astype(np.complex64)
        mine = sp.ZoomFFT(120, [0.1, 0.4], 48, fs=2.0)
        ref = scipy_signal.ZoomFFT(120, [0.1, 0.4], 48, fs=2.0)
        got, want = np.asarray(mine(x)), ref(x)
        assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5

    def test_length_check(self):
        with pytest.raises(ValueError):
            sp.CZT(64)(np.zeros(32, np.complex64))

    def test_choose_conv_method(self):
        assert sp.choose_conv_method(np.zeros(10), np.zeros(5)) == "direct"
        assert sp.choose_conv_method(np.zeros(4096), np.zeros(129)) == "fft"
        with pytest.raises(ValueError):
            sp.choose_conv_method(np.zeros(8), np.zeros(8), mode="nope")


class TestFindPeaksCWT:
    def test_noisy_vs_scipy(self):
        rng = np.random.default_rng(0)
        t = np.linspace(0, 10, 1000)
        x = np.sin(2 * np.pi * 0.7 * t) + 0.3 * rng.standard_normal(1000)
        for kwargs in ({}, {"min_snr": 2}, {"window_size": 40}):
            got = sp.find_peaks_cwt(x, np.arange(10, 40), **kwargs)
            want = scipy_signal.find_peaks_cwt(x, np.arange(10, 40), **kwargs)
            assert np.array_equal(got, want), kwargs

    def test_clean_vs_scipy(self):
        # fp64 host ridge matrix: noiseless signals must not produce
        # machine-noise ridge lines (the fp32 device cwt would)
        y = np.zeros(600)
        for c in (100, 280, 480):
            y += np.exp(-(((np.arange(600) - c) / 12.0) ** 2))
        got = sp.find_peaks_cwt(y, np.arange(5, 30))
        want = scipy_signal.find_peaks_cwt(y, np.arange(5, 30))
        assert np.array_equal(got, want)


class TestFindfreqs:
    def test_vs_scipy(self):
        b, a = scipy_signal.butter(4, 10.0, analog=True)
        assert np.allclose(sp.findfreqs(b, a, 15),
                           scipy_signal.findfreqs(b, a, 15))
        z, p, k = scipy_signal.cheby1(3, 1, 5.0, analog=True, output="zpk")
        assert np.allclose(sp.findfreqs(z, p, 10, kind="zp"),
                           scipy_signal.findfreqs(z, p, 10, kind="zp"))
        with pytest.raises(ValueError):
            sp.findfreqs(b, a, 10, kind="nope")
