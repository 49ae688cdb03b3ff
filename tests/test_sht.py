"""Spherical harmonic transform: scipy sph_harm_y oracle, exact round trip,
Parseval, Laplacian eigenrelation."""

import numpy as np
import pytest
from scipy.special import sph_harm_y

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(33)


def _rand_alm(rng, L):
    alm = np.zeros((2 * L - 1, L), np.complex64)
    for m in range(L):
        for l in range(m, L):
            alm[m, l] = rng.standard_normal() + 1j * rng.standard_normal()
    for m in range(1, L):
        for l in range(m, L):
            alm[2 * L - 1 - m, l] = rng.standard_normal() + 1j * rng.standard_normal()
    return alm


@pytest.mark.parametrize("L", [1, 16, 32])  # 2/8 ride the L=16 path (lane audit)
def test_roundtrip_exact(rng, L):
    alm = _rand_alm(rng, L)
    f = np.asarray(sp.isht(alm))
    assert f.shape == (L, 2 * L)
    back = np.asarray(sp.sht(f))
    scale = max(np.abs(alm).max(), 1.0)
    assert np.max(np.abs(back - alm)) / scale < 1e-5, L


def test_single_harmonic_matches_scipy(rng):
    """isht of a unit coefficient reproduces scipy's Y_lm on the grid."""
    L = 12
    theta, phi, _ = sp.sht_grid(L - 1)
    for (l, m) in [(0, 0), (3, 2), (7, -4), (11, 11), (5, 0)]:
        alm = np.zeros((2 * L - 1, L), np.complex64)
        q = m if m >= 0 else 2 * L - 1 + m
        alm[q, l] = 1.0
        f = np.asarray(sp.isht(alm))
        want = sph_harm_y(l, m, theta[:, None], phi[None, :])
        assert np.max(np.abs(f - want)) < 1e-5, (l, m)


def test_parseval(rng):
    L = 16
    alm = _rand_alm(rng, L)
    f = np.asarray(sp.isht(alm))
    _, _, w = sp.sht_grid(L - 1)
    quad = float((np.abs(f) ** 2 * w[:, None]).sum() * (2 * np.pi / (2 * L)))
    coef = float((np.abs(alm) ** 2).sum())
    assert abs(quad - coef) / coef < 1e-4


def test_sphere_laplacian_eigenrelation(rng):
    L = 10
    alm = np.zeros((2 * L - 1, L), np.complex64)
    alm[3, 5] = 1.0  # Y_{5,3}
    f = np.asarray(sp.isht(alm))
    lap = np.asarray(sp.sphere_laplacian(f))
    assert np.max(np.abs(lap - (-30.0) * f)) < 1e-3  # -l(l+1) = -30


def test_sht_batched_and_jit(rng):
    import jax

    L = 8
    alm = np.stack([_rand_alm(rng, L) for _ in range(3)])
    f = np.asarray(jax.jit(sp.isht)(alm))
    assert f.shape == (3, L, 2 * L)
    back = np.asarray(jax.jit(sp.sht)(f))
    assert np.max(np.abs(back - alm)) / np.abs(alm).max() < 1e-5


def test_sht_errors(rng):
    with pytest.raises(ValueError):
        sp.sht(np.zeros((4, 9), np.float32))  # nlon != 2*nlat
    with pytest.raises(ValueError):
        sp.isht(np.zeros((6, 4), np.complex64))  # 2L-1 mismatch
    with pytest.raises(ValueError):
        sp.sht_grid(-1)


def test_poisson_solve_sphere(rng):
    """laplacian(poisson_solve(f)) == f for zero-mean band-limited f."""
    L = 12
    alm = _rand_alm(rng, L)
    alm[0, 0] = 0.0  # zero sphere mean
    f = np.real(np.asarray(sp.isht(alm))).astype(np.float32)
    u = np.asarray(sp.poisson_solve_sphere(f))
    back = np.asarray(sp.sphere_laplacian(u))
    assert np.max(np.abs(back - f)) / np.max(np.abs(f)) < 1e-4


def test_sphere_convolve_heat_flow(rng):
    """Heat kernel bl = exp(-l(l+1) t) damps each degree by its eigenvalue."""
    L = 10
    alm = _rand_alm(rng, L)
    f = np.asarray(sp.isht(alm))
    t = 0.05
    l = np.arange(L)
    bl = np.exp(-l * (l + 1) * t).astype(np.float32)
    g = np.asarray(sp.sphere_convolve(f, bl))
    want = np.asarray(sp.isht(alm * bl[None, :]))
    assert np.max(np.abs(g - want)) < 1e-4 * np.abs(want).max()
    with pytest.raises(ValueError):
        sp.sphere_convolve(f, bl[:-1])


def test_sphere_grad_analytic(rng):
    """Gradient of analytic fields: f = cos(theta) and f = sin(theta)sin(phi)."""
    L = 16
    theta, phi, _ = sp.sht_grid(L - 1)
    TH, PH = theta[:, None], phi[None, :]
    f1 = np.broadcast_to(np.cos(TH), (L, 2 * L)).astype(np.float32)
    ut, up = (np.asarray(v) for v in sp.sphere_grad(f1))
    np.testing.assert_allclose(ut, -np.sin(TH) * np.ones_like(PH), atol=1e-4)
    np.testing.assert_allclose(up, 0.0, atol=1e-4)
    f2 = (np.sin(TH) * np.sin(PH)).astype(np.float32)
    ut, up = (np.asarray(v) for v in sp.sphere_grad(f2))
    np.testing.assert_allclose(ut, np.cos(TH) * np.sin(PH), atol=1e-3)
    np.testing.assert_allclose(up, np.cos(PH) * np.ones_like(TH), atol=1e-3)


def test_sphere_grad_batched_jit(rng):
    import jax

    L = 8
    alm = np.stack([_rand_alm(rng, L) for _ in range(2)])
    f = np.real(np.asarray(sp.isht(alm))).astype(np.float32)
    ut, up = jax.jit(sp.sphere_grad)(f)
    assert np.asarray(ut).shape == (2, L, 2 * L) == np.asarray(up).shape
    assert bool(np.isfinite(np.asarray(ut)).all())
    assert bool(np.isfinite(np.asarray(up)).all())


def test_sphere_div_of_grad_is_laplacian(rng):
    L = 12
    alm = _rand_alm(rng, L)
    alm[0, 0] = 0.0
    f = np.real(np.asarray(sp.isht(alm))).astype(np.float32)
    ut, up = sp.sphere_grad(f)
    got = np.asarray(sp.sphere_div(ut, up))
    want = np.asarray(sp.sphere_laplacian(f))
    assert np.max(np.abs(got - want)) < 1e-3 * max(1.0, np.abs(want).max())


def test_sphere_vort_of_grad_is_zero(rng):
    """Gradient fields are irrotational: vort(grad f) == 0."""
    L = 12
    alm = _rand_alm(rng, L)
    f = np.real(np.asarray(sp.isht(alm))).astype(np.float32)
    ut, up = sp.sphere_grad(f)
    z = np.asarray(sp.sphere_vort(ut, up))
    assert np.max(np.abs(z)) < 1e-2 * max(1.0, np.abs(np.asarray(up)).max())
    with pytest.raises(ValueError):
        sp.sphere_div(np.asarray(ut), np.asarray(up)[..., :-2])


def test_sphere_convolve_complex_kernel(rng):
    """Complex per-degree kernels (e.g. dispersive propagators) must keep
    their imaginary part."""
    L = 8
    alm = _rand_alm(rng, L)
    f = np.asarray(sp.isht(alm))
    bl = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
    g = np.asarray(sp.sphere_convolve(f, bl))
    want = np.asarray(sp.isht(alm * bl[None, :]))
    assert np.max(np.abs(g - want)) < 1e-4 * np.abs(want).max()


def test_sphere_helmholtz_roundtrip(rng):
    """u built from known potentials is recovered: u = grad(phi0) + rot(psi0)
    with rot(psi) = (-(1/sin)dpsi/dphi·(-1)... i.e. (u_t, u_p) =
    (g_phi_t - g_psi_p, g_phi_p + g_psi_t)."""
    L = 14
    a1, a2 = _rand_alm(rng, L), _rand_alm(rng, L)
    a1[0, 0] = a2[0, 0] = 0.0
    phi0 = np.real(np.asarray(sp.isht(a1))).astype(np.float32)
    psi0 = np.real(np.asarray(sp.isht(a2))).astype(np.float32)
    gpt, gpp = (np.asarray(v) for v in sp.sphere_grad(phi0))
    gst, gsp = (np.asarray(v) for v in sp.sphere_grad(psi0))
    ut, up = gpt - gsp, gpp + gst  # grad(phi) + k x grad(psi)
    phi, psi = (np.asarray(v) for v in sp.sphere_helmholtz(ut, up))
    scale = max(np.abs(phi0).max(), np.abs(psi0).max())
    assert np.max(np.abs(phi - phi0)) < 1e-3 * scale
    assert np.max(np.abs(psi - psi0)) < 1e-3 * scale


def test_sphere_helmholtz_complex_input(rng):
    """Complex vector fields keep their complex potentials."""
    L = 10
    a1 = _rand_alm(rng, L)
    a1[0, 0] = 0.0
    phi0 = np.asarray(sp.isht(a1))  # complex grid
    gpt, gpp = (np.asarray(v) for v in sp.sphere_grad(phi0))
    phi, psi = (np.asarray(v) for v in sp.sphere_helmholtz(gpt, gpp))
    assert np.iscomplexobj(phi)
    assert np.max(np.abs(phi - phi0)) < 1e-3 * np.abs(phi0).max()
    assert np.max(np.abs(psi)) < 1e-2 * np.abs(phi0).max()


@pytest.mark.slow
def test_roundtrip_L256_scalable(rng):
    """L = 256 round trip through the triangular-chunked Legendre scheme —
    the scale the dense (2L-1, L, L) layout could not reach (VERDICT r2 §3:
    ~2 GB at L = 512 dense; chunked stores ~L³/2 fp32 ≈ 33 MB here)."""
    import mixed_radix_fast_fourier_transform_tpu.ops.sht as sht_mod

    L = 256
    # bound the stored table volume: sum of chunk sizes ~ L^3/2 fp32
    chunks = sht_mod._legendre_chunks(L)
    stored = sum(p.nbytes for _, p in chunks)
    # ~L^3/2 ideal + _M_TILE granularity overhead; dense packed fp64 layout
    # would be (2L-1)*L*L*8 = 268 MB — chunked must stay far under that
    assert stored < 0.85 * (L**3) * 4, stored
    assert stored < 0.2 * (2 * L - 1) * L * L * 8, stored
    # band-limited random field round trip at fp32
    alm = np.zeros((2 * L - 1, L), np.complex64)
    m = rng.integers(0, L, 200)
    l = np.minimum(L - 1, m + rng.integers(0, L, 200))
    q = np.where(rng.random(200) < 0.5, m, (2 * L - 1 - np.maximum(m, 1)))
    alm[q, l] = rng.standard_normal(200) + 1j * rng.standard_normal(200)
    f = np.asarray(sp.isht(alm))
    assert f.shape == (L, 2 * L)
    back = np.asarray(sp.sht(f))
    scale = max(np.abs(alm).max(), 1.0)
    assert np.max(np.abs(back - alm)) / scale < 5e-4


def test_real_fast_path_matches_complex(rng):
    """Real-input sht (rfft + Hermitian fold) == complex-path sht."""
    L = 16
    f = rng.standard_normal((3, L, 2 * L)).astype(np.float32)
    a_real = np.asarray(sp.sht(f))
    a_cplx = np.asarray(sp.sht(f.astype(np.complex64)))
    scale = max(np.abs(a_cplx).max(), 1e-9)
    assert np.max(np.abs(a_real - a_cplx)) / scale < 1e-6


def test_vsht_roundtrip(rng):
    """ivsht(vsht(u)) == u for tangent fields (no monopole component)."""
    L = 14
    a1, a2 = _rand_alm(rng, L), _rand_alm(rng, L)
    a1[0, 0] = a2[0, 0] = 0.0
    phi0 = np.real(np.asarray(sp.isht(a1))).astype(np.float32)
    psi0 = np.real(np.asarray(sp.isht(a2))).astype(np.float32)
    gpt, gpp = (np.asarray(v) for v in sp.sphere_grad(phi0))
    gst, gsp = (np.asarray(v) for v in sp.sphere_grad(psi0))
    ut, up = gpt - gsp, gpp + gst
    S, T = sp.vsht(ut, up)
    assert np.asarray(S).shape == (2 * L - 1, L) == np.asarray(T).shape
    # l = 0 rows are zero (tangent fields have no monopole)
    assert np.abs(np.asarray(S)[:, 0]).max() < 1e-6
    bt, bp = (np.real(np.asarray(v)) for v in sp.ivsht(S, T))
    scale = max(np.abs(ut).max(), np.abs(up).max())
    assert np.max(np.abs(bt - ut)) < 2e-3 * scale
    assert np.max(np.abs(bp - up)) < 2e-3 * scale


def test_vsht_gradient_is_pure_spheroidal(rng):
    """vsht of a gradient field has zero toroidal part and spheroidal
    coefficients lambda*f_lm."""
    L = 12
    a = _rand_alm(rng, L)
    a[0, 0] = 0.0
    f = np.real(np.asarray(sp.isht(a))).astype(np.float32)
    flm = np.asarray(sp.sht(f))
    ut, up = sp.sphere_grad(f)
    S, T = (np.asarray(v) for v in sp.vsht(np.asarray(ut), np.asarray(up)))
    lam = np.sqrt(np.arange(L) * (np.arange(L) + 1.0))
    want = flm * lam[None, :]
    scale = max(np.abs(want).max(), 1.0)
    assert np.max(np.abs(S - want)) / scale < 2e-3
    assert np.max(np.abs(T)) / scale < 2e-3
    with pytest.raises(ValueError):
        sp.vsht(f, f[..., :-1])
    with pytest.raises(ValueError):
        sp.ivsht(flm, flm[..., :-1, :])


def test_isht_real_output_fast_path(rng):
    """isht(real_output=True) matches real(isht(.)) for symmetric alm."""
    L = 16
    f = rng.standard_normal((2, L, 2 * L)).astype(np.float32)
    a = sp.sht(f)
    full = np.real(np.asarray(sp.isht(a)))
    fast = np.asarray(sp.isht(a, real_output=True))
    assert not np.iscomplexobj(fast)
    assert np.max(np.abs(fast - full)) < 1e-6 * max(1.0, np.abs(full).max())


@pytest.mark.parametrize("L", [32])  # one L: cost is scan trace time, and
# L=8 rides the identical code path (lane-budget audit, round 4)
def test_recurrence_path_matches_tables(rng, L):
    """On-device Legendre recurrence == chunked-table path (both ways,
    complex and real-output variants)."""
    f = rng.standard_normal((2, L, 2 * L)).astype(np.float32)
    a_tab = np.asarray(sp.sht(f))
    a_rec = np.asarray(sp.sht_recurrence(f))
    scale = max(np.abs(a_tab).max(), 1e-9)
    assert np.max(np.abs(a_rec - a_tab)) / scale < 1e-5
    fc = (f + 1j * rng.standard_normal(f.shape)).astype(np.complex64)
    ac_tab = np.asarray(sp.sht(fc))
    ac_rec = np.asarray(sp.sht_recurrence(fc))
    assert np.max(np.abs(ac_rec - ac_tab)) / max(np.abs(ac_tab).max(), 1e-9) < 1e-5
    g_tab = np.asarray(sp.isht(a_tab))
    g_rec = np.asarray(sp.isht_recurrence(a_tab))
    gs = max(np.abs(g_tab).max(), 1e-9)
    assert np.max(np.abs(g_rec - g_tab)) / gs < 1e-5
    g_r = np.asarray(sp.isht_recurrence(a_tab, real_output=True))
    assert not np.iscomplexobj(g_r)
    assert np.max(np.abs(g_r - np.real(g_tab))) / gs < 1e-5


@pytest.mark.parametrize(
    "L", [16, pytest.param(64, marks=pytest.mark.slow)]
)
def test_recurrence_compensated_matches_tables_exactly(rng, L):
    """The double-word (compensated=True) recurrence carry reproduces the
    fp64-generated chunked-table path to fp32 exactness — the plain fp32
    scan drifts ~L·eps (its own test tolerates 1e-5); the compensated scan
    must land at least 10x tighter, both directions."""
    f = rng.standard_normal((2, L, 2 * L)).astype(np.float32)
    a_tab = np.asarray(sp.sht(f))
    a_dw = np.asarray(sp.sht_recurrence(f, compensated=True))
    scale = max(np.abs(a_tab).max(), 1e-9)
    assert np.max(np.abs(a_dw - a_tab)) / scale < 1e-6
    g_tab = np.asarray(sp.isht(a_tab))
    g_dw = np.asarray(sp.isht_recurrence(a_tab, compensated=True))
    gs = max(np.abs(g_tab).max(), 1e-9)
    assert np.max(np.abs(g_dw - g_tab)) / gs < 1e-6
    # complex input and real-output variants ride the same scan
    fc = (f + 1j * rng.standard_normal(f.shape)).astype(np.complex64)
    ac_tab = np.asarray(sp.sht(fc))
    ac_dw = np.asarray(sp.sht_recurrence(fc, compensated=True))
    assert (
        np.max(np.abs(ac_dw - ac_tab)) / max(np.abs(ac_tab).max(), 1e-9)
        < 1e-6
    )
    g_r = np.asarray(sp.isht_recurrence(a_tab, real_output=True, compensated=True))
    assert not np.iscomplexobj(g_r)
    assert np.max(np.abs(g_r - np.real(g_tab))) / gs < 1e-6


@pytest.mark.slow
def test_recurrence_rescaling_high_m(rng):
    """A pure high-m harmonic near the band limit round-trips through the
    recurrence path — exercises the exponent rescaling (its sectoral seed
    underflows fp32 by hundreds of orders of magnitude at polar
    latitudes)."""
    L = 128
    alm = np.zeros((2 * L - 1, L), np.complex64)
    alm[L - 8, L - 4] = 1.0  # m = L-8, l = L-4
    f = np.asarray(sp.isht_recurrence(alm))
    back = np.array(sp.sht_recurrence(f))
    assert abs(back[L - 8, L - 4] - 1.0) < 1e-3
    back[L - 8, L - 4] = 0.0
    assert np.max(np.abs(back)) < 1e-3


def test_ivsht_real_dtype_coefficients(rng):
    """Real-dtype coefficient arrays must not silently lose the i·m
    longitude component (round-3 review finding)."""
    L = 10
    S = np.zeros((2 * L - 1, L), np.float32)
    S[1, 2] = 1.0  # m=1, l=2 — nonzero d/dphi component
    ut, up = (np.asarray(v) for v in sp.ivsht(S, np.zeros_like(S)))
    assert np.max(np.abs(up)) > 1e-3  # would be exactly 0 with the bug
    utc, upc = (np.asarray(v) for v in sp.ivsht(
        S.astype(np.complex64), np.zeros((2 * L - 1, L), np.complex64)
    ))
    np.testing.assert_allclose(up, upc, atol=1e-6)


def test_equiangular_grid_roundtrip(rng):
    """Driscoll-Healy-class equiangular grid: exact band-limited round trip
    (both directions) and parity with the Gauss-grid coefficients."""
    L = 16
    alm = _rand_alm(rng, L)
    f_eq = np.asarray(sp.isht(alm, grid="equiangular"))
    assert f_eq.shape == (2 * L, 2 * L)
    back = np.asarray(sp.sht(f_eq, grid="equiangular"))
    scale = max(np.abs(alm).max(), 1.0)
    assert np.max(np.abs(back - alm)) / scale < 1e-5
    # same coefficients as the Gauss path for the same underlying function
    f_g = np.asarray(sp.isht(alm))
    a_g = np.asarray(sp.sht(f_g))
    assert np.max(np.abs(back - a_g)) / scale < 2e-5
    # real-field fast paths on the equiangular grid
    fr = np.real(f_eq).astype(np.float32)
    ar = np.asarray(sp.sht(fr, grid="equiangular"))
    fr2 = np.asarray(sp.isht(ar, real_output=True, grid="equiangular"))
    ar2 = np.asarray(sp.sht(fr2, grid="equiangular"))
    assert np.max(np.abs(ar2 - ar)) / max(np.abs(ar).max(), 1e-9) < 1e-5


def test_equiangular_single_harmonic_matches_scipy(rng):
    L = 10
    theta, phi, _ = sp.sht_grid(L - 1, grid="equiangular")
    assert theta.shape == (2 * L,)
    for (l, m) in [(0, 0), (4, 3), (7, -5)]:
        alm = np.zeros((2 * L - 1, L), np.complex64)
        q = m if m >= 0 else 2 * L - 1 + m
        alm[q, l] = 1.0
        f = np.asarray(sp.isht(alm, grid="equiangular"))
        want = sph_harm_y(l, m, theta[:, None], phi[None, :])
        assert np.max(np.abs(f - want)) < 1e-5, (l, m)


def test_sht_bad_grid(rng):
    with pytest.raises(ValueError):
        sp.sht(np.zeros((8, 16), np.float32), grid="bogus")
    with pytest.raises(ValueError):
        sp.sht(np.zeros((8, 16), np.float32), grid="equiangular")  # not square
    with pytest.raises(ValueError):
        sp.sht(np.zeros((3, 3), np.float32), grid="equiangular")  # odd square
    with pytest.raises(ValueError):  # past the table cap: no recurrence fallback
        sp.sht(np.zeros((2060, 2060), np.float32), grid="equiangular")
    with pytest.raises(ValueError):
        sp.isht(np.zeros((2 * 1030 - 1, 1030), np.complex64), grid="equiangular")
    with pytest.raises(ValueError):  # odd-square tangent fields
        sp.sphere_div(
            np.zeros((3, 3), np.float32), np.zeros((3, 3), np.float32),
            grid="equiangular",
        )


def test_equiangular_calculus(rng):
    """Sphere calculus on the equiangular grid: div(grad f) == laplacian f,
    Helmholtz/vsht round trips, heat-flow convolve."""
    L = 12
    alm = _rand_alm(rng, L)
    alm[0, 0] = 0.0
    f = np.asarray(sp.isht(alm, real_output=True, grid="equiangular"))
    lap = np.asarray(sp.sphere_laplacian(f, grid="equiangular"))
    ut, up = sp.sphere_grad(f, grid="equiangular")
    div = np.asarray(sp.sphere_div(ut, up, grid="equiangular"))
    assert np.max(np.abs(div - lap)) < 1e-3 * max(1.0, np.abs(lap).max())
    u = np.asarray(sp.poisson_solve_sphere(lap, grid="equiangular"))
    assert np.max(np.abs(u - f)) < 1e-3 * max(1.0, np.abs(f).max())
    S, T = sp.vsht(np.asarray(ut), np.asarray(up), grid="equiangular")
    bt, bp = (np.real(np.asarray(v)) for v in sp.ivsht(S, T, grid="equiangular"))
    scale = max(np.abs(np.asarray(ut)).max(), np.abs(np.asarray(up)).max())
    assert np.max(np.abs(bt - np.asarray(ut))) < 2e-3 * scale
    assert np.max(np.abs(bp - np.asarray(up))) < 2e-3 * scale
    bl = np.exp(-np.arange(L) * (np.arange(L) + 1) * 0.05).astype(np.float32)
    g = np.asarray(sp.sphere_convolve(f, bl, grid="equiangular"))
    want = np.asarray(sp.isht(
        np.asarray(sp.sht(f, grid="equiangular")) * bl[None, :],
        real_output=True, grid="equiangular",
    ))
    assert np.max(np.abs(g - want)) < 1e-4 * max(1.0, np.abs(want).max())


class TestRotateSht:
    """Wigner-D rotation: unitarity, composition, phase/addition-theorem
    oracles, grid-level longitude-shift equivalence."""

    @staticmethod
    def _rand_alm_full(rng, L):
        from mixed_radix_fast_fourier_transform_tpu.ops.sht import (
            _packed_m_values,
        )

        mv = _packed_m_values(L)
        alm = np.zeros((2 * L - 1, L), np.complex64)
        for i, m in enumerate(mv):
            for l in range(abs(m), L):
                alm[i, l] = rng.standard_normal() + 1j * rng.standard_normal()
        return alm, mv

    def test_per_degree_power_preserved(self, rng):
        L = 16
        alm, _ = self._rand_alm_full(rng, L)
        out = np.asarray(sp.rotate_sht(alm, 0.7, 1.1, -0.4))
        p_in = np.array([np.sum(np.abs(alm[:, l]) ** 2) for l in range(L)])
        p_out = np.array([np.sum(np.abs(out[:, l]) ** 2) for l in range(L)])
        assert np.abs(p_out - p_in).max() / p_in.max() < 1e-5

    def test_inverse_composition(self, rng):
        L = 12
        alm, _ = self._rand_alm_full(rng, L)
        out = np.asarray(sp.rotate_sht(alm, 0.7, 1.1, -0.4))
        back = np.asarray(
            sp.rotate_sht(out.astype(np.complex64), 0.4, -1.1, -0.7)
        )
        assert np.abs(back - alm).max() < 1e-5

    def test_z_rotation_is_m_phase(self, rng):
        L = 12
        alm, mv = self._rand_alm_full(rng, L)
        got = np.asarray(sp.rotate_sht(alm, 0.9, 0.0, 0.0))
        want = alm * np.exp(-1j * mv * 0.9)[:, None]
        assert np.abs(got - want).max() < 1e-5

    def test_rotated_zonal_matches_addition_theorem(self, rng):
        from mixed_radix_fast_fourier_transform_tpu.ops.sht import (
            _packed_m_values,
        )

        L = 10
        a, b = 0.7, 1.1
        zon = np.zeros((2 * L - 1, L), np.complex64)
        zon[0, :] = 1.0
        r = np.asarray(sp.rotate_sht(zon, a, b, 0.0))
        mv = _packed_m_values(L)
        for l in range(L):
            for i, m in enumerate(mv):
                if abs(m) > l:
                    continue
                want = np.sqrt(4 * np.pi / (2 * l + 1)) * np.conj(
                    sph_harm_y(l, m, b, a)
                )
                assert abs(r[i, l] - want) < 1e-6, (l, m)

    def test_grid_longitude_shift(self, rng):
        """Rotating by alpha = one longitude step about z == rolling the
        synthesized grid field along phi."""
        L = 8
        alm, _ = self._rand_alm_full(rng, L)
        step = 2 * np.pi / (2 * L)
        f0 = np.asarray(sp.isht(alm))
        f1 = np.asarray(sp.isht(np.asarray(sp.rotate_sht(alm, step, 0.0, 0.0))))
        assert np.abs(f1 - np.roll(f0, 1, axis=-1)).max() < 1e-5

    def test_real_field_stays_symmetric(self, rng):
        """Rotating coefficients of a real field keeps the Hermitian
        m-symmetry (rotation commutes with conjugation of real fields)."""
        L = 8
        f = rng.standard_normal((L, 2 * L)).astype(np.float32)
        a = np.asarray(sp.sht(f))
        ar = np.asarray(sp.rotate_sht(a, 0.5, 0.8, 0.3))
        f2 = np.asarray(sp.isht(ar))
        assert np.abs(f2.imag).max() < 1e-5 * max(1.0, np.abs(f2.real).max())

    def test_bad_shape(self):
        with pytest.raises(ValueError):
            sp.rotate_sht(np.zeros((5, 4), np.complex64), 0.1, 0.2, 0.3)
