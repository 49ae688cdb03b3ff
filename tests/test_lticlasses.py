"""LTI classes + place_poles vs scipy fp64 oracles."""

import numpy as np
import pytest
import scipy.signal as ss

import mixed_radix_fast_fourier_transform_tpu as sp


# ----------------------------------------------------------------- class layer

def test_lti_factory_dispatch():
    assert isinstance(sp.lti([1.0], [1.0, 1.0]), sp.TransferFunction)
    assert isinstance(sp.lti([], [-1.0], 2.0), sp.ZerosPolesGain)
    assert isinstance(sp.lti([[-1.0]], [[1.0]], [[1.0]], [[0.0]]),
                      sp.StateSpace)
    sys = sp.dlti([1.0], [1.0, -0.5], dt=0.1)
    assert isinstance(sys, sp.TransferFunction) and sys.dt == 0.1
    assert sp.dlti([1.0], [1.0, -0.5]).dt is True
    with pytest.raises(ValueError):
        sp.lti([1.0])


def test_conversions_match_scipy():
    num, den = [1.0, 3.0, 3.0], [1.0, 2.0, 1.0]
    ours = sp.TransferFunction(num, den)
    ref = ss.TransferFunction(num, den)
    z_o = ours.to_zpk()
    z_r = ref.to_zpk()
    np.testing.assert_allclose(np.sort_complex(z_o.zeros),
                               np.sort_complex(z_r.zeros), atol=1e-12)
    np.testing.assert_allclose(np.sort_complex(z_o.poles),
                               np.sort_complex(z_r.poles), atol=1e-12)
    assert np.isclose(z_o.gain, z_r.gain)
    s_o = ours.to_ss()
    s_r = ref.to_ss()
    np.testing.assert_allclose(s_o.A, s_r.A, atol=1e-12)
    np.testing.assert_allclose(s_o.B, s_r.B, atol=1e-12)
    np.testing.assert_allclose(s_o.C, s_r.C, atol=1e-12)
    np.testing.assert_allclose(s_o.D, s_r.D, atol=1e-12)
    # copy construction across representations
    back = sp.TransferFunction(s_o)
    np.testing.assert_allclose(back.num, np.atleast_1d(np.squeeze(s_r.to_tf().num)),
                               atol=1e-10)


def test_zeros_poles_properties():
    sys = sp.TransferFunction([1.0, 0.0], [1.0, 3.0, 2.0])
    ref = ss.TransferFunction([1.0, 0.0], [1.0, 3.0, 2.0])
    np.testing.assert_allclose(np.sort_complex(sys.poles),
                               np.sort_complex(ref.poles), atol=1e-12)
    np.testing.assert_allclose(np.sort_complex(sys.zeros),
                               np.sort_complex(ref.zeros), atol=1e-12)


def test_continuous_step_impulse_bode():
    num, den = [1.0], [1.0, 2.0, 1.0]
    ours = sp.lti(num, den)
    ref = ss.lti(num, den)
    T = np.linspace(0, 8, 200)
    t_o, y_o = ours.step(T=T)
    t_r, y_r = ref.step(T=T)
    np.testing.assert_allclose(np.asarray(y_o), y_r, atol=1e-4)
    t_o, y_o = ours.impulse(T=T)
    t_r, y_r = ref.impulse(T=T)
    np.testing.assert_allclose(np.asarray(y_o), y_r, atol=1e-4)
    w = np.logspace(-2, 2, 50)
    w_o, mag_o, ph_o = ours.bode(w=w)
    w_r, mag_r, ph_r = ref.bode(w=w)
    np.testing.assert_allclose(mag_o, mag_r, atol=1e-8)
    np.testing.assert_allclose(ph_o, ph_r, atol=1e-8)


def test_continuous_output_lsim():
    sys_t = ([1.0, 1.0], [1.0, 1.5, 1.0])
    ours = sp.lti(*sys_t)
    ref = ss.lti(*sys_t)
    T = np.linspace(0, 5, 128)
    U = np.sin(2 * np.pi * 0.7 * T)
    t_o, y_o, _ = ours.output(U, T)
    t_r, y_r, _ = ref.output(U, T)
    np.testing.assert_allclose(np.asarray(y_o).ravel(), y_r.ravel(), atol=2e-4)


def test_discrete_methods():
    num, den, dt = [0.2], [1.0, -0.8], 0.05
    ours = sp.dlti(num, den, dt=dt)
    ref = ss.dlti(num, den, dt=dt)
    t_o, y_o = ours.step(n=40)
    t_r, y_r = ref.step(n=40)
    np.testing.assert_allclose(np.asarray(y_o[0]).ravel(), y_r[0].ravel(),
                               atol=1e-5)
    np.testing.assert_allclose(t_o, t_r)
    t_o, y_o = ours.impulse(n=40)
    t_r, y_r = ref.impulse(n=40)
    np.testing.assert_allclose(np.asarray(y_o[0]).ravel(), y_r[0].ravel(),
                               atol=1e-5)
    w_o, h_o = ours.freqresp(n=64)
    w_r, h_r = ref.freqresp(n=64)
    np.testing.assert_allclose(h_o, h_r, atol=1e-8)
    u = np.cos(np.arange(50) * 0.3)
    t_o, y_o = ours.output(u, None)
    t_r, y_r = ref.output(u, t=None)
    np.testing.assert_allclose(np.asarray(y_o).ravel(), y_r.ravel(), atol=1e-5)


def test_to_discrete_roundtrip():
    ours = sp.lti([1.0], [1.0, 1.0]).to_discrete(0.1, method="zoh")
    ref = ss.lti([1.0], [1.0, 1.0]).to_discrete(0.1, method="zoh")
    np.testing.assert_allclose(ours.num, np.atleast_1d(np.squeeze(ref.num)),
                               atol=1e-12)
    np.testing.assert_allclose(ours.den, ref.den, atol=1e-12)
    assert ours.dt == 0.1
    ss_d = sp.StateSpace([[-1.0]], [[1.0]], [[1.0]], [[0.0]]).to_discrete(0.2)
    ref_d = ss.StateSpace([[-1.0]], [[1.0]], [[1.0]], [[0.0]]).to_discrete(0.2)
    np.testing.assert_allclose(ss_d.A, ref_d.A, atol=1e-12)
    np.testing.assert_allclose(ss_d.B, ref_d.B, atol=1e-12)


def test_dt_validation():
    cont = sp.lti([1.0], [1.0, 1.0])
    with pytest.raises(ValueError):
        sp.TransferFunction([1.0], [1.0, 1.0], dt=0.1).to_discrete(0.1)
    assert cont.dt is None


def test_bad_coefficients_warning():
    with pytest.warns(sp.BadCoefficients):
        sp.normalize([0.0, 0.0, 1.0], [1.0, 0.5])


# ---------------------------------------------------------------- place_poles

def _check_placement(A, B, poles, method="YT"):
    res = sp.place_poles(np.asarray(A, float), np.asarray(B, float),
                         poles, method=method)
    want = np.sort_complex(np.asarray(poles, complex))
    got = np.sort_complex(res.computed_poles)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    assert np.isrealobj(res.gain_matrix)
    return res


def test_place_real_poles_mimo():
    A = np.array([[1.380, -0.2077, 6.715, -5.676],
                  [-0.5814, -4.290, 0.0, 0.6750],
                  [1.067, 4.273, -6.654, 5.893],
                  [0.0480, 4.273, 1.343, -2.104]])
    B = np.array([[0.0, 5.679],
                  [1.136, 1.136],
                  [0.0, 0.0],
                  [-3.146, 0.0]])
    poles = [-0.2, -0.5, -5.0566, -8.6659]
    for method in ("YT", "KNV0"):
        _check_placement(A, B, poles, method)


def test_place_complex_pairs():
    A = np.array([[1.380, -0.2077, 6.715, -5.676],
                  [-0.5814, -4.290, 0.0, 0.6750],
                  [1.067, 4.273, -6.654, 5.893],
                  [0.0480, 4.273, 1.343, -2.104]])
    B = np.array([[0.0, 5.679],
                  [1.136, 1.136],
                  [0.0, 0.0],
                  [-3.146, 0.0]])
    poles = [-1.0 + 1.0j, -1.0 - 1.0j, -2.0 + 0.5j, -2.0 - 0.5j]
    _check_placement(A, B, poles)


def test_place_siso():
    # companion-form SISO: subspaces are 1-D, X fully determined
    A = np.array([[0.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0],
                  [-6.0, -11.0, -6.0]])
    B = np.array([[0.0], [0.0], [1.0]])
    _check_placement(A, B, [-2.0, -3.0, -4.0])
    _check_placement(A, B, [-1.0 + 2.0j, -1.0 - 2.0j, -5.0])


def test_place_matches_scipy_poles(rng):
    A = rng.standard_normal((5, 5))
    B = rng.standard_normal((5, 2))
    poles = np.array([-1.0, -2.0, -3.0, -1.5 + 1.0j, -1.5 - 1.0j])
    res = _check_placement(A, B, poles)
    ref = ss.place_poles(A, B, poles)
    np.testing.assert_allclose(np.sort_complex(res.computed_poles),
                               np.sort_complex(ref.computed_poles),
                               rtol=1e-5, atol=1e-7)


def test_place_validation():
    A = np.eye(3)
    B = np.array([[1.0], [0.0], [0.0]])
    with pytest.raises(ValueError):  # uncontrollable
        sp.place_poles(A, B, [-1.0, -2.0, -3.0])
    A2 = np.array([[0.0, 1.0], [0.0, 0.0]])
    B2 = np.array([[0.0], [1.0]])
    with pytest.raises(ValueError):  # unpaired complex pole
        sp.place_poles(A2, B2, [-1.0 + 1j, -2.0])
    with pytest.raises(ValueError):  # multiplicity beyond rank(B)
        sp.place_poles(A2, B2, [-1.0, -1.0])
    with pytest.raises(ValueError):
        sp.place_poles(A2, B2, [-1.0, -2.0], method="bogus")
