"""Design-glue parity wave: ba transforms, iirdesign, partial fractions,
FIR design (firwin2/firls/gammatone), and measurement utilities — all
host-fp64 against the scipy oracle."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import mixed_radix_fast_fourier_transform_tpu as sp


def _sorted_rp(r, p):
    i = np.lexsort((np.asarray(r).real, np.asarray(p).imag, np.asarray(p).real))
    return np.asarray(r)[i], np.asarray(p)[i]


class TestBaGlue:
    def test_bilinear(self):
        b, a = scipy_signal.butter(4, 10.0, analog=True)
        gb, ga = sp.bilinear(b, a, fs=100.0)
        wb, wa = scipy_signal.bilinear(b, a, fs=100.0)
        assert np.allclose(gb, wb, atol=1e-10) and np.allclose(ga, wa, atol=1e-10)

    @pytest.mark.parametrize("xform,args", [
        ("lp2lp", (3.0,)), ("lp2hp", (2.0,)),
        ("lp2bp", (2.0, 0.5)), ("lp2bs", (2.0, 0.5)),
    ])
    def test_lp2x(self, xform, args):
        b, a = scipy_signal.butter(3, 1.0, analog=True)
        got = getattr(sp, xform)(b, a, *args)
        want = getattr(scipy_signal, xform)(b, a, *args)
        for g, w in zip(got, want):
            assert np.allclose(g, w, rtol=1e-8, atol=1e-10)

    def test_normalize(self):
        g = sp.normalize([0.0, 2.0, 4.0], [2.0, 1.0])
        w = scipy_signal.normalize([0.0, 2.0, 4.0], [2.0, 1.0])
        assert np.allclose(g[0], w[0]) and np.allclose(g[1], w[1])

    def test_freqz_zpk(self):
        z, p, k = scipy_signal.butter(8, 0.3, output="zpk")
        w1, h1 = sp.freqz_zpk(z, p, k, worN=128)
        w2, h2 = scipy_signal.freqz_zpk(z, p, k, worN=128)
        assert np.allclose(w1, w2) and np.allclose(h1, h2)

    @pytest.mark.parametrize("ftype", ["butter", "cheby1", "cheby2", "ellip"])
    def test_iirdesign(self, ftype):
        gb, ga = sp.iirdesign(0.2, 0.3, 1, 40, ftype=ftype)
        wb, wa = scipy_signal.iirdesign(0.2, 0.3, 1, 40, ftype=ftype)
        assert np.allclose(gb, wb, atol=1e-9) and np.allclose(ga, wa, atol=1e-9)

    def test_lfiltic(self):
        b, a = scipy_signal.butter(3, 0.3)
        y = np.array([0.1, -0.2, 0.05])
        x = np.array([0.3, 0.2, -0.1])
        assert np.allclose(sp.lfiltic(b, a, y, x),
                           scipy_signal.lfiltic(b, a, y, x), atol=1e-12)


class TestPartialFractions:
    @pytest.mark.parametrize("b,a", [
        ([1.0, 2.0], [1.0, 3.0, 2.0]),
        ([1.0], np.convolve([1, 1], np.convolve([1, 1], [1, 2]))),
        ([1.0, 0, 0, 1.0], [1.0, 3.0, 2.0]),  # improper
    ], ids=["simple", "repeated", "improper"])
    def test_residue(self, b, a):
        gr, gp, gk = sp.residue(b, a)
        wr, wp, wk = scipy_signal.residue(b, a)
        assert np.allclose(*_sorted_rp(gr, gp)[:1], _sorted_rp(wr, wp)[0], atol=1e-8)
        assert np.allclose(_sorted_rp(gr, gp)[1], _sorted_rp(wr, wp)[1], atol=1e-8)
        assert np.allclose(np.atleast_1d(gk), np.atleast_1d(wk), atol=1e-10) \
            or (len(np.atleast_1d(gk)) == 0 and len(np.atleast_1d(wk)) == 0)

    @pytest.mark.parametrize("b,a", [
        ([1.0, -0.5], np.convolve([1.0, -0.9], [1.0, 0.5])),
        ([1.0, 0.3, 0.1],
         np.convolve([1.0, -0.8], np.convolve([1.0, -0.8], [1.0, 0.4]))),
        ([2.0, 1.0, 0.5, 0.1], [1.0, -0.5]),  # improper in z^-1
    ], ids=["simple", "repeated", "improper"])
    def test_residuez_roundtrip(self, b, a):
        gr, gp, gk = sp.residuez(b, a)
        wr, wp, wk = scipy_signal.residuez(b, a)
        assert np.allclose(_sorted_rp(gr, gp)[0], _sorted_rp(wr, wp)[0], atol=1e-8)
        gb, ga = sp.invresz(gr, gp, gk)
        nb = np.atleast_1d(np.asarray(b, float))
        assert np.allclose(np.real(gb)[: len(nb)], nb / a[0] * a[0], atol=1e-8)

    def test_invres(self):
        r, p, k = scipy_signal.residue([1.0, 2.0], [1.0, 3.0, 2.0])
        gb, ga = sp.invres(r, p, k)
        wb, wa = scipy_signal.invres(r, p, k)
        assert np.allclose(np.real(gb), wb, atol=1e-10)
        assert np.allclose(np.real(ga), wa, atol=1e-10)

    def test_unique_roots(self):
        u, m = sp.unique_roots([1.0, 1.0001, 2.0], tol=1e-2)
        assert sorted(m.tolist()) == [1, 2]


class TestFIRDesign:
    def test_kaiserord(self):
        assert sp.kaiserord(65, 0.05) == scipy_signal.kaiserord(65, 0.05)

    @pytest.mark.parametrize("numtaps,anti", [
        (51, False), (50, False), (51, True), (52, True)])
    def test_firwin2(self, numtaps, anti):
        fr = [0.0, 0.3, 0.3, 1.0]
        gn = [0.0, 1.0, 0.5, 0.0] if anti else [1.0, 1.0, 0.0, 0.0]
        got = sp.firwin2(numtaps, fr, gn, antisymmetric=anti)
        want = scipy_signal.firwin2(numtaps, fr, gn, antisymmetric=anti)
        assert np.max(np.abs(got - want)) < 2e-8

    def test_firwin2_validation(self):
        with pytest.raises(ValueError):
            sp.firwin2(50, [0, 0.5, 1.0], [1, 1, 1])  # type II, gain at nyq
        with pytest.raises(ValueError):
            sp.firwin2(51, [0, 1.0], [1, 1], antisymmetric=True)  # type III

    @pytest.mark.parametrize("numtaps,bands,desired,weight", [
        (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], None),
        (45, [0, 0.15, 0.25, 0.5, 0.6, 1.0], [0, 0, 1, 1, 0, 0],
         [1.0, 2.0, 0.5]),
    ], ids=["lowpass", "bandpass-weighted"])
    def test_firls(self, numtaps, bands, desired, weight):
        got = sp.firls(numtaps, bands, desired, weight=weight)
        want = scipy_signal.firls(numtaps, bands, desired, weight=weight)
        assert np.max(np.abs(got - want)) < 1e-8

    def test_firls_even_rejected(self):
        with pytest.raises(ValueError):
            sp.firls(30, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0])

    @pytest.mark.parametrize("ftype", ["fir", "iir"])
    def test_gammatone(self, ftype):
        got = sp.gammatone(440.0, ftype, fs=16000.0)
        want = scipy_signal.gammatone(440.0, ftype, fs=16000.0)
        for g, w in zip(got, want):
            assert np.max(np.abs(np.asarray(g) - np.asarray(w))) < 1e-12

    def test_gammatone_validation(self):
        with pytest.raises(ValueError):
            sp.gammatone(9000.0, "fir", fs=16000.0)  # above Nyquist


class TestMeasurementUtils:
    @pytest.mark.parametrize("nbits", [4, 7, 10])
    def test_max_len_seq(self, nbits):
        g_seq, g_st = sp.max_len_seq(nbits)
        w_seq, w_st = scipy_signal.max_len_seq(nbits)
        assert np.array_equal(g_seq, w_seq) and np.array_equal(g_st, w_st)
        # MLS property: balanced within 1, flat circular autocorrelation
        s = 2.0 * g_seq - 1.0
        ac = np.fft.ifft(np.abs(np.fft.fft(s)) ** 2).real
        assert abs(ac[0] - len(s)) < 1e-6
        assert np.max(np.abs(ac[1:] + 1.0)) < 1e-6

    def test_max_len_seq_state(self):
        g = sp.max_len_seq(6, state=[1, 0, 1, 0, 1, 1], length=50)
        w = scipy_signal.max_len_seq(6, state=[1, 0, 1, 0, 1, 1], length=50)
        assert np.array_equal(g[0], w[0]) and np.array_equal(g[1], w[1])

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_correlation_lags(self, mode):
        for l1, l2 in [(10, 4), (4, 10), (9, 9), (8, 5)]:
            assert np.array_equal(sp.correlation_lags(l1, l2, mode),
                                  scipy_signal.correlation_lags(l1, l2, mode))

    def test_vectorstrength(self):
        ev = np.array([0.1, 0.25, 1.1, 2.05, 3.14])
        g = sp.vectorstrength(ev, 1.0)
        w = scipy_signal.vectorstrength(ev, 1.0)
        assert abs(g[0] - w[0]) < 1e-12 and abs(g[1] - w[1]) < 1e-12
        g = sp.vectorstrength(ev, [0.5, 1.0, 2.0])
        w = scipy_signal.vectorstrength(ev, [0.5, 1.0, 2.0])
        assert np.allclose(g[0], w[0]) and np.allclose(g[1], w[1])
