"""Array processing: steering, covariance, Bartlett/MVDR/MUSIC — fp64 oracles."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _sim(rng, n=12, T=400, angles=(-20.0, 25.0), amps=(1.0, 0.7),
         noise=0.1):
    A = sp.steering_vector(n, np.asarray(angles))
    s = (rng.standard_normal((len(angles), T))
         + 1j * rng.standard_normal((len(angles), T))) / np.sqrt(2)
    s = s * np.asarray(amps)[:, None]
    x = A @ s + noise * (
        rng.standard_normal((n, T)) + 1j * rng.standard_normal((n, T))
    ) / np.sqrt(2)
    return x.astype(np.complex64), A


class TestSteering:
    def test_ula_phases(self):
        A = sp.steering_vector(8, 30.0)
        assert A.shape == (8, 1)
        want = np.exp(2j * np.pi * 0.5 * np.arange(8) * np.sin(np.pi / 6))
        np.testing.assert_allclose(A[:, 0], want, atol=1e-12)
        # broadside: all ones
        np.testing.assert_allclose(sp.steering_vector(8, 0.0)[:, 0], 1.0)

    def test_custom_positions_and_errors(self):
        pos = np.array([[0.0, 0.0], [0.25, 0.1], [0.7, -0.2]])
        A = sp.steering_vector(pos, [0.0, 45.0])
        assert A.shape == (3, 2)
        np.testing.assert_allclose(np.abs(A), 1.0, atol=1e-12)
        # 1-D positions promote to the x-axis
        A1 = sp.steering_vector(np.array([0.0, 0.5, 1.0]), 10.0)
        np.testing.assert_allclose(
            A1, sp.steering_vector(3, 10.0), atol=1e-12
        )
        with pytest.raises(ValueError):
            sp.steering_vector(1, 0.0)
        with pytest.raises(ValueError):
            sp.steering_vector(np.zeros((3, 4)), 0.0)


class TestCovariance:
    def test_matches_numpy(self, rng):
        x, _ = _sim(rng, n=6, T=100)
        R = np.asarray(sp.spatial_covariance(x))
        want = (x.astype(np.complex128) @ x.conj().T.astype(np.complex128)
                ) / x.shape[1]
        np.testing.assert_allclose(R, want, atol=1e-4)
        Rfb = np.asarray(sp.spatial_covariance(x, forward_backward=True))
        J = np.eye(6)[::-1]
        np.testing.assert_allclose(
            Rfb, 0.5 * (want + J @ want.conj() @ J), atol=1e-4
        )
        with pytest.raises(ValueError):
            sp.spatial_covariance(np.zeros(8, np.complex64))


class TestSpectra:
    def test_bartlett_and_mvdr_find_sources(self, rng):
        x, _ = _sim(rng, angles=(-20.0, 25.0))
        R = sp.spatial_covariance(x)
        ang, pb = sp.bartlett_spectrum(R, 12)
        _, pm = sp.mvdr_spectrum(R, 12, diagonal_loading=1e-4)
        pb, pm = np.asarray(pb), np.asarray(pm)
        from scipy.signal import find_peaks as _fp
        for p in (pb, pm):
            pk, _ = _fp(p, height=p.max() / 20)
            got = ang[pk]
            assert abs(got - (-20.0)).min() < 1.0
            assert abs(got - 25.0).min() < 1.0
        # MVDR resolves more sharply: narrower 3 dB width at the -20 peak
        def width(p):
            i = np.argmin(np.abs(ang - (-20.0)))
            i = i - 3 + np.argmax(p[i - 3 : i + 4])
            half = p[i] / 2
            lo = i
            while lo > 0 and p[lo] > half:
                lo -= 1
            hi = i
            while hi < p.size - 1 and p[hi] > half:
                hi += 1
            return hi - lo
        assert width(pm) < width(pb)

    def test_bartlett_oracle_value(self, rng):
        x, _ = _sim(rng, n=6, T=64)
        R = np.asarray(sp.spatial_covariance(x)).astype(np.complex128)
        grid = np.array([-40.0, 0.0, 33.0])
        ang, p = sp.bartlett_spectrum(R, 6, grid)
        A = sp.steering_vector(6, grid)
        want = np.real(np.einsum("ig,ij,jg->g", A.conj(), R, A)) / 36
        np.testing.assert_allclose(np.asarray(p), want, rtol=1e-4)
        _, pm = sp.mvdr_spectrum(R, 6, grid)
        Ri = np.linalg.inv(R)
        wantm = 1.0 / np.real(np.einsum("ig,ij,jg->g", A.conj(), Ri, A))
        np.testing.assert_allclose(np.asarray(pm), wantm, rtol=1e-3)
        with pytest.raises(ValueError):
            sp.bartlett_spectrum(R, 8)
        with pytest.raises(ValueError):
            sp.mvdr_spectrum(R, 8)


class TestWeights:
    def test_unit_look_gain_and_interferer_null(self, rng):
        x, _ = _sim(rng, angles=(0.0, 30.0), amps=(1.0, 10.0), noise=0.05)
        R = sp.spatial_covariance(x)
        w = np.asarray(sp.mvdr_weights(R, 12, 0.0, diagonal_loading=1e-5))
        a0 = sp.steering_vector(12, 0.0)[:, 0]
        a1 = sp.steering_vector(12, 30.0)[:, 0]
        assert abs(np.vdot(w, a0) - 1.0) < 1e-3  # distortionless look
        # 10x interferer suppressed >25 dB below the look gain
        assert abs(np.vdot(w, a1)) < 0.05
        # matches the fp64 closed form
        R64 = np.asarray(R).astype(np.complex128)
        R64 = R64 + 1e-5 * np.trace(R64).real / 12 * np.eye(12)
        Ria = np.linalg.solve(R64, a0)
        w64 = Ria / np.vdot(a0, Ria)
        assert np.abs(w - w64).max() < 0.05
        with pytest.raises(ValueError):
            sp.mvdr_weights(R, 9, 0.0)


class TestMusicDOA:
    def test_close_sources_resolved(self, rng):
        # 8 degrees apart — under the 12-element Bartlett beamwidth
        x, _ = _sim(rng, angles=(10.0, 18.0), T=800, noise=0.05)
        R = np.asarray(sp.spatial_covariance(x, forward_backward=True))
        ang, p = sp.music_doa(R, 12, 2, np.linspace(-90, 90, 1441))
        from scipy.signal import find_peaks as _fp
        pk, _ = _fp(p, height=p.max() / 50)
        top = pk[np.argsort(p[pk])[-2:]]
        got = np.sort(ang[top])
        assert abs(got[0] - 10.0) < 0.8 and abs(got[1] - 18.0) < 0.8
        with pytest.raises(ValueError):
            sp.music_doa(R, 12, 0)
        with pytest.raises(ValueError):
            sp.music_doa(R, 10, 2)
        with pytest.raises(ValueError):
            sp.music_doa(R[0], 12, 2)
