"""Radar chain: pulse compression, range-Doppler, CFAR — numpy fp64 oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _lfm(nt, bw=0.4):
    t = np.arange(nt, dtype=np.float64)
    return np.exp(1j * np.pi * bw / nt * (t - nt / 2) ** 2)


class TestPulseCompression:
    def test_matches_numpy_correlate(self, rng):
        n, nt = 300, 64
        rx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        tx = _lfm(nt).astype(np.complex64)
        y = np.asarray(sp.pulse_compression(rx, tx, normalize=False))
        want = np.correlate(
            rx.astype(np.complex128), tx.astype(np.complex128), "valid"
        )
        assert y.shape == (n - nt + 1,)
        np.testing.assert_allclose(y, want, atol=1e-4 * np.abs(want).max())

    def test_full_mode_and_unit_peak(self, rng):
        n, nt, d0 = 256, 48, 100
        tx = _lfm(nt)
        rx = np.zeros(n, np.complex128)
        rx[d0 : d0 + nt] = tx  # unit-amplitude echo at delay d0
        y = np.asarray(sp.pulse_compression(rx.astype(np.complex64), tx))
        assert abs(np.abs(y[d0]) - 1.0) < 1e-3
        assert np.argmax(np.abs(y)) == d0
        yf = np.asarray(
            sp.pulse_compression(rx.astype(np.complex64), tx, mode="full")
        )
        assert yf.shape == (n + nt - 1,)
        # full mode starts at delay −(nt−1); its tail holds the valid lags
        np.testing.assert_allclose(
            yf[nt - 1 : nt - 1 + (n - nt + 1)], y, atol=1e-5
        )
        assert np.argmax(np.abs(yf)) == d0 + nt - 1

    def test_window_lowers_sidelobes_keeps_peak(self, rng):
        n, nt, d0 = 512, 128, 200
        tx = _lfm(nt, bw=0.8)
        rx = np.zeros(n, np.complex128)
        rx[d0 : d0 + nt] = tx
        yr = np.abs(np.asarray(
            sp.pulse_compression(rx.astype(np.complex64), tx)
        ))
        yw = np.abs(np.asarray(
            sp.pulse_compression(rx.astype(np.complex64), tx,
                                 window="hamming")
        ))
        assert abs(yw[d0] - 1.0) < 5e-3  # normalization keeps unit peak
        far = np.r_[: d0 - 8, d0 + 9 : yr.size]
        assert yw[far].max() < yr[far].max() * 0.5

    def test_errors(self, rng):
        tx = _lfm(32)
        with pytest.raises(ValueError):
            sp.pulse_compression(np.zeros(16, np.complex64), tx)
        with pytest.raises(ValueError):
            sp.pulse_compression(np.zeros(64, np.complex64), tx, mode="same")
        with pytest.raises(ValueError):
            sp.pulse_compression(
                np.zeros(64, np.complex64), np.zeros((2, 8), np.complex64)
            )


class TestRangeDoppler:
    def test_moving_target_lands_in_right_bin(self):
        n_pulses, n, nt = 32, 256, 48
        tx = _lfm(nt)
        d0, fd = 77, 5  # delay bin, Doppler bin (cycles per CPI)
        m = np.arange(n_pulses)[:, None]
        rx = np.zeros((n_pulses, n), np.complex128)
        rx[:, d0 : d0 + nt] = tx * np.exp(2j * np.pi * fd * m / n_pulses)
        Y = np.asarray(sp.range_doppler(rx.astype(np.complex64), tx))
        assert Y.shape == (n_pulses, n - nt + 1)
        pk = np.unravel_index(np.argmax(np.abs(Y)), Y.shape)
        assert pk == (n_pulses // 2 + fd, d0)
        # hann taper is coherent-gain normalized: unit echo ~ unit peak
        assert abs(np.abs(Y[pk]) - 1.0) < 0.05

    def test_zero_doppler_is_center_row(self):
        n_pulses, n, nt = 16, 128, 32
        tx = _lfm(nt)
        rx = np.zeros((n_pulses, n), np.complex128)
        rx[:, 40 : 40 + nt] = tx
        Y = np.abs(np.asarray(sp.range_doppler(rx.astype(np.complex64), tx)))
        assert np.unravel_index(np.argmax(Y), Y.shape)[0] == n_pulses // 2
        with pytest.raises(ValueError):
            sp.range_doppler(np.zeros(64, np.complex64), tx)


def _cfar_oracle_1d(p, t, g, pfa, method):
    from mixed_radix_fast_fourier_transform_tpu.ops.radar import _goso_alpha

    n = p.size
    det = np.zeros(n, bool)
    th = np.zeros(n)
    for i in range(n):
        lead = p[max(i - g - t, 0) : max(i - g, 0)]
        lag = p[min(i + g + 1, n) : min(i + g + 1 + t, n)]
        if method == "ca":
            cells = np.r_[lead, lag]
            nt_, noise = cells.size, cells.mean() if cells.size else 0.0
            alpha = nt_ * (pfa ** (-1.0 / nt_) - 1) if nt_ else 0.0
        else:
            ml = lead.mean() if lead.size else None
            mg = lag.mean() if lag.size else None
            if ml is None:
                ml = mg
            if mg is None:
                mg = ml
            noise = max(ml, mg) if method == "go" else min(ml, mg)
            # exact Hansen/Trunk calibration for the full window (the
            # implementation applies it uniformly; edges are approximate)
            alpha = _goso_alpha(t, pfa, method)
        th[i] = alpha * noise
        det[i] = p[i] > th[i]
    return det, th


class TestCFAR:
    @pytest.mark.parametrize("method", ["ca", "go", "so"])
    def test_1d_matches_bruteforce(self, rng, method):
        p = rng.exponential(1.0, 160).astype(np.float32)
        p[40] += 60.0
        p[41] += 20.0
        det, th = sp.cfar(p, num_train=8, num_guard=2, pfa=1e-3,
                          method=method)
        dw, tw = _cfar_oracle_1d(np.asarray(p, np.float64), 8, 2, 1e-3,
                                 method)
        np.testing.assert_allclose(np.asarray(th), tw, rtol=2e-4)
        assert np.array_equal(np.asarray(det), dw)
        assert np.asarray(det)[40]

    def test_2d_ring(self, rng):
        p = rng.exponential(1.0, (48, 64)).astype(np.float32)
        p[20, 30] += 80.0
        det, th = sp.cfar(p, num_train=4, num_guard=1, pfa=1e-3,
                          axes=(-2, -1))
        det = np.asarray(det)
        assert det[20, 30]
        # brute-force the ring estimate at an interior cell
        i, j, t, g = 20, 30, 4, 1
        box = p.astype(np.float64)[i - t - g : i + t + g + 1,
                                   j - t - g : j + t + g + 1]
        inner = p.astype(np.float64)[i - g : i + g + 1, j - g : j + g + 1]
        ntr = box.size - inner.size
        noise = (box.sum() - inner.sum()) / ntr
        alpha = ntr * ((1e-3) ** (-1.0 / ntr) - 1)
        np.testing.assert_allclose(np.asarray(th)[i, j], alpha * noise,
                                   rtol=2e-4)
        # false-alarm rate loosely near pfa on the noise-only cells
        mask = np.ones_like(det)
        mask[15:26, 25:36] = False
        assert det[mask].mean() < 0.02

    def test_os_matches_bruteforce(self, rng):
        t, g, k, pfa = 8, 2, 12, 1e-3
        p = rng.exponential(1.0, 200)
        p[90] += 50.0
        p[120:200] *= 10.0  # clutter edge: OS stays calibrated
        det, th = sp.cfar(p.astype(np.float32), num_train=t, num_guard=g,
                          pfa=pfa, method="os", rank=k)
        pp = np.pad(p, t + g, mode="reflect")
        # Rohling's alpha
        from mixed_radix_fast_fourier_transform_tpu.ops.radar import _os_alpha
        alpha = _os_alpha(2 * t, k, pfa)
        pfa_chk = np.prod([(2 * t - i) / (2 * t - i + alpha)
                           for i in range(k)])
        assert abs(pfa_chk - pfa) / pfa < 1e-6
        for i in (0, 5, 90, 119, 150, 199):
            c = i + t + g
            cells = np.r_[pp[c - t - g : c - g], pp[c + g + 1 : c + g + t + 1]]
            noise = np.sort(cells)[k - 1]
            np.testing.assert_allclose(np.asarray(th)[i], alpha * noise,
                                       rtol=2e-5)
        assert np.asarray(det)[90]
        # default rank = 3N/4
        det2, th2 = sp.cfar(p.astype(np.float32), num_train=t, num_guard=g,
                            pfa=pfa, method="os")
        assert np.asarray(th2).shape == p.shape
        with pytest.raises(ValueError):
            sp.cfar(p.astype(np.float32), num_train=t, method="os", rank=0)

    def test_goso_pfa_calibration(self, rng):
        # the exact Hansen/Trunk square-law equations (ADVICE r4): the
        # pfa argument is the ACTUAL false-alarm rate for go/so
        from mixed_radix_fast_fourier_transform_tpu.ops.radar import (
            _goso_alpha, _pfa_go_so,
        )

        # n=1 closed forms: Pfa_GO = 2/(1+T) - 2/(2+T), SO = 2/(2+T)
        for T in (0.5, 2.0, 7.0):
            assert abs(_pfa_go_so(T, 1, "go")
                       - (2 / (1 + T) - 2 / (2 + T))) < 1e-12
            assert abs(_pfa_go_so(T, 1, "so") - 2 / (2 + T)) < 1e-12
        # identity: Pfa_GO + Pfa_SO = 2 (1+T)^{-n} for every n
        for n in (1, 4, 8, 16, 64):
            for T in (0.3, 1.0, 3.0):
                assert abs(_pfa_go_so(T, n, "go") + _pfa_go_so(T, n, "so")
                           - 2 * (1 + T) ** (-n)) < 1e-12
        # bisection inverts exactly
        for method in ("go", "so"):
            for n, pfa in ((4, 0.05), (8, 1e-3), (16, 1e-4)):
                a = _goso_alpha(n, pfa, method)
                assert abs(_pfa_go_so(a / n, n, method) - pfa) / pfa < 1e-8
        # Monte Carlo: exponential noise, X > alpha*max/min(mean halves)
        n, pfa = 4, 0.05
        N = 400_000
        z = rng.exponential(1.0, (N, 2, n)).mean(-1)
        x = rng.exponential(1.0, N)
        for method, agg in (("go", np.max), ("so", np.min)):
            rate = np.mean(x > _goso_alpha(n, pfa, method) * agg(z, axis=-1))
            assert abs(rate - pfa) < 4 * np.sqrt(pfa * (1 - pfa) / N)
        # ordering sanity: alpha_so > alpha_ca-class > alpha_go
        a_go = _goso_alpha(8, 1e-3, "go")
        a_so = _goso_alpha(8, 1e-3, "so")
        assert a_so > a_go

    def test_batched_and_errors(self, rng):
        p = rng.exponential(1.0, (3, 96)).astype(np.float32)
        det, th = sp.cfar(p, num_train=6, num_guard=1, pfa=1e-2)
        assert np.asarray(det).shape == p.shape
        for row in range(3):
            dw, tw = _cfar_oracle_1d(
                np.asarray(p[row], np.float64), 6, 1, 1e-2, "ca"
            )
            np.testing.assert_allclose(np.asarray(th)[row], tw, rtol=2e-4)
        with pytest.raises(ValueError):
            sp.cfar(p.astype(np.complex64))
        with pytest.raises(ValueError):
            sp.cfar(p, num_train=0)
        with pytest.raises(ValueError):
            sp.cfar(p, pfa=0.0)
        with pytest.raises(ValueError):
            sp.cfar(p, method="tm")
        with pytest.raises(ValueError):
            sp.cfar(p, axes=(-2, -1), method="go")
        with pytest.raises(ValueError):
            sp.cfar(np.zeros(8, np.float32), num_train=8, num_guard=2)
