"""windows namespace module vs scipy.signal.windows fp64 oracles."""

import numpy as np
import pytest
import scipy.signal.windows as sw

from mixed_radix_fast_fourier_transform_tpu import windows as w

SIMPLE = ["barthann", "bartlett", "blackman", "blackmanharris", "bohman",
          "boxcar", "cosine", "flattop", "hamming", "hann", "lanczos",
          "nuttall", "parzen", "triang"]


@pytest.mark.parametrize("name", SIMPLE)
@pytest.mark.parametrize("sym", [True, False])
def test_simple_windows_match_scipy(name, sym):
    got = getattr(w, name)(33, sym=sym)
    want = getattr(sw, name)(33, sym=sym)
    np.testing.assert_allclose(got, want, atol=1e-12, err_msg=name)


@pytest.mark.parametrize("sym", [True, False])
def test_parameterized_windows(sym):
    np.testing.assert_allclose(w.kaiser(40, 8.6, sym=sym),
                               sw.kaiser(40, 8.6, sym=sym), atol=1e-12)
    np.testing.assert_allclose(w.tukey(40, 0.3, sym=sym),
                               sw.tukey(40, 0.3, sym=sym), atol=1e-12)
    np.testing.assert_allclose(w.gaussian(40, 7.0, sym=sym),
                               sw.gaussian(40, 7.0, sym=sym), atol=1e-12)
    np.testing.assert_allclose(w.chebwin(41, 80.0, sym=sym),
                               sw.chebwin(41, 80.0, sym=sym), atol=1e-10)
    np.testing.assert_allclose(
        w.general_gaussian(40, 1.5, 7.0, sym=sym),
        sw.general_gaussian(40, 1.5, 7.0, sym=sym), atol=1e-12)
    np.testing.assert_allclose(
        w.general_hamming(40, 0.6, sym=sym),
        sw.general_hamming(40, 0.6, sym=sym), atol=1e-12)
    np.testing.assert_allclose(
        w.general_cosine(40, [0.5, 0.4, 0.1], sym=sym),
        sw.general_cosine(40, [0.5, 0.4, 0.1], sym=sym), atol=1e-12)


def test_exponential_and_center():
    np.testing.assert_allclose(w.exponential(31, tau=5.0),
                               sw.exponential(31, tau=5.0), atol=1e-12)
    np.testing.assert_allclose(w.exponential(32, tau=4.0, sym=False),
                               sw.exponential(32, tau=4.0, sym=False),
                               atol=1e-12)
    np.testing.assert_allclose(
        w.exponential(31, center=10, tau=3.0, sym=False),
        sw.exponential(31, center=10, tau=3.0, sym=False), atol=1e-12)
    with pytest.raises(ValueError):
        w.exponential(32, center=10, sym=True)


@pytest.mark.parametrize("norm", [True, False])
@pytest.mark.parametrize("sym", [True, False])
def test_taylor(norm, sym):
    got = w.taylor(45, nbar=5, sll=40, norm=norm, sym=sym)
    want = sw.taylor(45, nbar=5, sll=40, norm=norm, sym=sym)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_kaiser_bessel_derived():
    got = w.kaiser_bessel_derived(40, 8.6)
    want = sw.kaiser_bessel_derived(40, 8.6)
    np.testing.assert_allclose(got, want, atol=1e-12)
    with pytest.raises(ValueError):
        w.kaiser_bessel_derived(41, 8.6)
    with pytest.raises(ValueError):
        w.kaiser_bessel_derived(40, 8.6, sym=False)


def test_dpss_and_get_window_reexported():
    assert w.dpss is not None and w.get_window is not None
    np.testing.assert_allclose(np.asarray(w.dpss(64, 2.5, 3)),
                               sw.dpss(64, 2.5, 3), atol=1e-10)


def test_length_one_periodic_is_ones():
    # review finding: scipy's M=1 guard applies in the periodic branch too
    for name in ("hann", "bartlett", "hamming", "triang"):
        np.testing.assert_allclose(getattr(w, name)(1, sym=False), [1.0])
    np.testing.assert_allclose(w.kaiser(1, 8.6, sym=False), [1.0])
    np.testing.assert_allclose(w.exponential(1, tau=2.0, sym=False), [1.0])
