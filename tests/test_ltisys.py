"""LTI toolbox: conversions, discretization, scan-based simulation —
scipy fp64 oracles.  The simulation paths run the same associative-scan
recurrence as ops/iir, so device output is fp32-class vs scipy."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import mixed_radix_fast_fourier_transform_tpu as sp


SYS_C = (np.array([[0.0, 1.0], [-4.0, -0.5]]), np.array([[0.0], [1.0]]),
         np.array([[1.0, 0.0]]), np.array([[0.0]]))


class TestConversions:
    def test_tf2ss_roundtrip(self):
        b, a = scipy_signal.butter(4, 0.4)
        A1, B1, C1, D1 = sp.tf2ss(b, a)
        ref = scipy_signal.tf2ss(b, a)
        for g, w in zip((A1, B1, C1, D1), ref):
            assert np.allclose(g, w, atol=1e-12)
        n1, d1 = sp.ss2tf(A1, B1, C1, D1)
        n2, d2 = scipy_signal.ss2tf(*ref)
        assert np.allclose(n1, n2, atol=1e-9) and np.allclose(d1, d2, atol=1e-9)

    def test_zpk_ss_roundtrip(self):
        z, p, k = scipy_signal.butter(3, 0.3, output="zpk")
        A, B, C, D = sp.zpk2ss(z, p, k)
        z2, p2, k2 = sp.ss2zpk(A, B, C, D)
        assert abs(k2 - k) < 1e-9
        assert np.allclose(np.sort_complex(p2), np.sort_complex(p), atol=1e-8)

    def test_abcd_validation(self):
        with pytest.raises(ValueError):
            sp.abcd_normalize(np.eye(2), np.zeros((3, 1)), np.zeros((1, 2)),
                              np.zeros((1, 1)))


class TestCont2Discrete:
    @pytest.mark.parametrize("method", [
        "zoh", "foh", "bilinear", "euler", "backward_diff", "impulse"])
    def test_methods(self, method):
        got = sp.cont2discrete(SYS_C, 0.05, method=method)
        want = scipy_signal.cont2discrete(SYS_C, 0.05, method=method)
        for g, w in zip(got[:4], want[:4]):
            assert np.allclose(g, w, atol=1e-12)

    def test_gbt_and_tf_form(self):
        got = sp.cont2discrete(SYS_C, 0.05, method="gbt", alpha=0.3)
        want = scipy_signal.cont2discrete(SYS_C, 0.05, method="gbt", alpha=0.3)
        for g, w in zip(got[:4], want[:4]):
            assert np.allclose(g, w, atol=1e-12)
        g = sp.cont2discrete(([1.0], [1.0, 1.0]), 0.1, method="zoh")
        w = scipy_signal.cont2discrete(([1.0], [1.0, 1.0]), 0.1, method="zoh")
        assert np.allclose(g[0], w[0], atol=1e-12)
        assert np.allclose(g[1], w[1], atol=1e-12)

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            sp.cont2discrete(SYS_C, 0.1, method="nope")


class TestSimulation:
    def test_dlsim(self, rng):
        sysd = scipy_signal.cont2discrete(SYS_C, 0.05, method="zoh")
        u = rng.standard_normal(300)
        t1, y1, x1 = sp.dlsim(sysd, u.astype(np.float32))
        t2, y2, x2 = scipy_signal.dlsim(sysd, u)
        assert np.allclose(t1, t2)
        assert np.max(np.abs(np.asarray(y1) - y2)) < 1e-4
        assert np.max(np.abs(np.asarray(x1) - x2)) < 1e-4

    def test_dlsim_tf_form_two_outputs(self):
        sysd = scipy_signal.cont2discrete(([1.0, 0.5], [1.0, 0.8, 4.0]), 0.02)
        t1, y1 = sp.dlsim(sysd, np.ones(100, np.float32))
        t2, y2 = scipy_signal.dlsim(sysd, np.ones(100))
        # lightly damped poles: fp32 scan error accumulates along the chain
        assert np.max(np.abs(np.asarray(y1) - y2)) < 5e-4

    def test_dstep_dimpulse(self):
        sysd = scipy_signal.cont2discrete(SYS_C, 0.05, method="zoh")
        for mine, ref in [(sp.dstep, scipy_signal.dstep),
                          (sp.dimpulse, scipy_signal.dimpulse)]:
            t1, ys1 = mine(sysd, n=60)
            t2, ys2 = ref(sysd, n=60)
            assert np.allclose(t1, t2)
            assert np.max(np.abs(np.asarray(ys1[0]) - ys2[0])) < 1e-5

    @pytest.mark.parametrize("interp", [True, False])
    def test_lsim(self, interp):
        T = np.linspace(0, 5, 401)
        U = np.sin(2 * np.pi * 0.7 * T)
        t1, y1, x1 = sp.lsim(SYS_C, U.astype(np.float32), T, interp=interp)
        t2, y2, x2 = scipy_signal.lsim(SYS_C, U, T, interp=interp)
        assert np.max(np.abs(np.asarray(y1)[:, 0] - y2)) < 1e-4

    def test_lsim_requires_uniform_t(self):
        with pytest.raises(ValueError):
            sp.lsim(SYS_C, np.ones(4), np.array([0.0, 0.1, 0.3, 0.35]))

    def test_step_impulse(self):
        t1, y1 = sp.step(SYS_C)
        t2, y2 = scipy_signal.step(scipy_signal.lti(*SYS_C), T=t1)
        assert np.max(np.abs(np.asarray(y1) - y2)) < 1e-3
        t1, y1 = sp.impulse(SYS_C)
        t2, y2 = scipy_signal.impulse(scipy_signal.lti(*SYS_C), T=t1)
        assert np.max(np.abs(np.asarray(y1) - y2)) < 1e-3


class TestFrequencyResponses:
    def test_dfreqresp_dbode(self):
        sysd = scipy_signal.cont2discrete(SYS_C, 0.05, method="zoh")
        w1, h1 = sp.dfreqresp(sysd, n=50)
        w2, h2 = scipy_signal.dfreqresp(
            scipy_signal.dlti(*sysd[:4], dt=sysd[4]), n=50)
        assert np.allclose(w1, w2) and np.max(np.abs(h1 - h2)) < 1e-8
        g = sp.dbode(sysd, n=40)
        w = scipy_signal.dbode(scipy_signal.dlti(*sysd[:4], dt=sysd[4]), n=40)
        for a, b in zip(g, w):
            assert np.allclose(a, b, atol=1e-6)

    def test_freqresp_bode(self):
        w1, h1 = sp.freqresp(SYS_C, n=40)
        w2, h2 = scipy_signal.freqresp(scipy_signal.lti(*SYS_C), w=w1)
        assert np.max(np.abs(h1 - h2)) < 1e-8
        g = sp.bode(SYS_C, n=40)
        w = scipy_signal.bode(scipy_signal.lti(*SYS_C), w=g[0])
        assert np.allclose(g[1], w[1], atol=1e-8)
        assert np.allclose(g[2], w[2], atol=1e-6)
