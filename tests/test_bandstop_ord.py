"""Band-stop order selection with scipy's passband-edge optimization.

Orders must match scipy exactly; the optimized Wn edges agree to the
optimizer tolerance (scipy's fminbound xatol is 1e-5 — our golden-section
converges tighter, so rtol=1e-3 bounds the comparison safely).
"""

import numpy as np
import pytest
import scipy.signal as ss

import mixed_radix_fast_fourier_transform_tpu as sp

SPECS = [
    ([0.1, 0.6], [0.2, 0.5], 3, 40, False, None),
    ([0.2, 0.7], [0.3, 0.5], 1, 60, False, None),
    ([1000, 6000], [2000, 4500], 3, 50, False, 20000),
    ([10, 60], [20, 45], 2, 30, True, None),
]

PAIRS = [
    (sp.buttord, ss.buttord),
    (sp.cheb1ord, ss.cheb1ord),
    (sp.cheb2ord, ss.cheb2ord),
    (sp.ellipord, ss.ellipord),
]


@pytest.mark.parametrize("ours,ref", PAIRS,
                         ids=["butt", "cheb1", "cheb2", "ellip"])
@pytest.mark.parametrize("spec", SPECS)
def test_bandstop_order_matches_scipy(ours, ref, spec):
    wp, ws, gpass, gstop, analog, fs = spec
    kw = dict(analog=analog) if fs is None else dict(analog=analog, fs=fs)
    n_o, wn_o = ours(wp, ws, gpass, gstop, **kw)
    n_r, wn_r = ref(wp, ws, gpass, gstop, **kw)
    assert n_o == n_r
    np.testing.assert_allclose(np.atleast_1d(wn_o), np.atleast_1d(wn_r),
                               rtol=1e-3)


def test_band_stop_obj_matches_scipy():
    passb = np.tan(np.pi * np.array([0.1, 0.6]) / 2)
    stopb = np.tan(np.pi * np.array([0.2, 0.5]) / 2)
    for kind in ("butter", "cheby", "ellip"):
        for wp in (0.17, 0.25, 0.30):
            got = sp.band_stop_obj(wp, 0, passb, stopb, 3, 40, kind)
            want = ss.band_stop_obj(wp, 0, passb, stopb, 3, 40, kind)
            assert np.isclose(got, want, rtol=1e-9), (kind, wp)
    with pytest.raises(ValueError):
        sp.band_stop_obj(0.2, 0, passb, stopb, 3, 40, "bogus")


def test_bandstop_design_meets_spec():
    # the selected (N, Wn) must actually meet the gpass/gstop spec
    wp, ws, gpass, gstop = [0.1, 0.6], [0.2, 0.5], 3, 40
    n, wn = sp.buttord(wp, ws, gpass, gstop)
    b, a = sp.butter(n, wn, btype="bandstop")
    w, h = sp.freqz(b, a, worN=2048)
    f = w / np.pi
    mag = 20 * np.log10(np.abs(np.asarray(h)) + 1e-300)
    passband = (f <= wp[0] + 1e-6) | (f >= wp[1] - 1e-6)
    stopband = (f >= ws[0] - 1e-4) & (f <= ws[1] + 1e-4)
    assert mag[passband].min() >= -gpass - 0.1
    assert mag[stopband].max() <= -gstop + 0.5
