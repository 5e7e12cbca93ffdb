"""Canopy RT gates.

1. G == 1 reduces the directional elemental exactly to the standard one.
2. Direct transmission through a canopy slab is exp(-G tau / mu).
3. Bi-Lambertian leaf phase function: normalized, correct ssa, black-leaf
   limit.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vsmartmom.core.canopy import (bilambertian_greek, elemental_directional,
                                   make_canopy_layer, ross_g)
from vsmartmom.core.rt import elemental, make_rsolve
from vsmartmom.scattering.phase import (Polarization, compute_Z_moments,
                                        get_greek_rayleigh)
from vsmartmom.util.quadrature import rt_set_streams


def _setup(n_spec=3):
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 40.0, [0.0], pol.n)
    n = len(quad.qp_mu_n)
    i0_vec = np.zeros(n)
    i0_vec[quad.i_mu0_n] = 1.0
    gc, ssa = bilambertian_greek(0.45, 0.35)
    z_pp, z_mp = compute_Z_moments(pol, quad.qp_mu, gc, 0)
    return pol, quad, n, i0_vec, z_pp, z_mp, ssa


def test_g_one_reduces_to_standard():
    pol, quad, n, i0_vec, z_pp, z_mp, ssa = _setup()
    dtau = jnp.full(3, 2e-4)
    omega = jnp.full(3, ssa)
    qp = jnp.asarray(quad.qp_mu_n)
    wct2 = jnp.asarray(quad.wt_mu_n) / 2
    tau_sum = jnp.zeros(3)
    mu0n = float(quad.qp_mu_n[quad.i_mu0_n])
    args = (dtau, omega, z_pp[None], z_mp[None], qp, wct2, 0.5, tau_sum,
            jnp.asarray(i0_vec), quad.i_mu0_n, 1, mu0n)
    r0, t0, jp0, jm0 = elemental(*args)
    g = jnp.ones(n)
    r1, t1, jp1, jm1 = elemental_directional(
        dtau, omega, z_pp[None], z_mp[None], g, qp, wct2, 0.5, tau_sum,
        jnp.asarray(i0_vec), quad.i_mu0_n, 1, mu0n)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jp1), np.asarray(jp0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jm1), np.asarray(jm0), rtol=1e-12)


def test_canopy_direct_transmission():
    """Black leaves (ssa -> 0): T++ diagonal == exp(-G tau / mu)."""
    pol, quad, n, i0_vec, z_pp, z_mp, _ = _setup()
    qp = jnp.asarray(quad.qp_mu_n)
    g = jnp.asarray(ross_g(np.asarray(quad.qp_mu_n), chi=0.0))
    eye = jnp.broadcast_to(jnp.eye(n), (3, n, n))
    tau = jnp.full(3, 1.5)
    lay = make_canopy_layer(
        tau, jnp.full(3, 1e-9), z_pp[None], z_mp[None], g, jnp.zeros(3),
        qp, jnp.asarray(quad.wt_mu_n) / 2, 0.5, jnp.asarray(i0_vec),
        quad.i_mu0_n, 1, float(quad.qp_mu_n[quad.i_mu0_n]),
        jnp.asarray(quad.mu0), jnp.ones(n), float(quad.qp_mu.min()), eye,
        make_rsolve("lu"))
    t_diag = np.diagonal(np.asarray(lay.t_pp)[0])
    expect = np.exp(-1.5 * np.asarray(g) / np.asarray(qp))
    np.testing.assert_allclose(t_diag, expect, rtol=1e-6)


def test_ross_g_values():
    mu = np.linspace(0.05, 1.0, 20)
    np.testing.assert_allclose(ross_g(mu, 0.0), 0.5, atol=1e-12)
    # planophile leaves: higher G toward nadir (mu -> 1)
    g_plan = ross_g(mu, 0.6)
    assert g_plan[-1] > g_plan[0]
    # erectophile: opposite
    g_erec = ross_g(mu, -0.4)
    assert g_erec[-1] < g_erec[0]


def test_bilambertian_phase():
    gc, ssa = bilambertian_greek(0.45, 0.35)
    assert ssa == pytest.approx(0.8)
    assert gc.beta[0] == pytest.approx(1.0)
    # reconstruct and check normalization + positivity
    from numpy.polynomial.legendre import legvander, leggauss
    x, w = leggauss(200)
    p = legvander(x, len(gc.beta) - 1) @ (gc.beta / ((2 * np.arange(
        len(gc.beta)) + 1) / 2) * ((2 * np.arange(len(gc.beta)) + 1) / 2))
    p = legvander(x, len(gc.beta) - 1) @ gc.beta
    assert np.sum(w * p) / 2 == pytest.approx(1.0, rel=1e-8)
    assert np.all(p > -1e-9)
    # purely transmitting leaves forward-scatter more than reflecting ones
    gc_t, _ = bilambertian_greek(0.0, 0.8)
    gc_r, _ = bilambertian_greek(0.8, 0.0)
    p_t = legvander(x, len(gc_t.beta) - 1) @ gc_t.beta
    p_r = legvander(x, len(gc_r.beta) - 1) @ gc_r.beta
    assert p_t[-1] > p_r[-1]        # x = +1 is forward


def test_canopy_lai_saturation():
    """Reflectance grows monotonically with LAI and saturates (the
    classic canopy NIR response); also guards the G-projection factor in
    the scattering terms (without it doubling diverges at LAI ~ 2)."""
    from vsmartmom.core.rt import interaction, vacuum_layer
    from vsmartmom.core.surface import lambertian_surface_layer

    pol, quad, n, i0_vec, z_pp, z_mp, ssa = _setup()
    qp = jnp.asarray(quad.qp_mu_n)
    g = jnp.asarray(ross_g(np.asarray(quad.qp_mu_n), 0.0))
    eye = jnp.broadcast_to(jnp.eye(n), (1, n, n))
    rs = make_rsolve("lu")
    vals = []
    for lai in (0.5, 1.0, 2.0, 4.0, 8.0):
        lay = make_canopy_layer(
            jnp.full(1, lai), jnp.full(1, ssa), z_pp[None], z_mp[None], g,
            jnp.zeros(1), qp, jnp.asarray(quad.wt_mu_n) / 2, 0.5,
            jnp.asarray(i0_vec), quad.i_mu0_n, 1,
            float(quad.qp_mu_n[quad.i_mu0_n]), jnp.asarray(quad.mu0),
            jnp.ones(n), float(quad.qp_mu.min()), eye, rs)
        comp = interaction(vacuum_layer(1, n, jnp.float64), lay, eye,
                           rsolve=rs)
        surf = lambertian_surface_layer(
            0.05, 1, 1, qp, jnp.asarray(quad.wt_mu_n),
            jnp.asarray(i0_vec), jnp.full(1, 0.5 * lai),
            jnp.asarray(quad.mu0), True, jnp.float64)
        comp = interaction(comp, surf, eye, rsolve=rs)
        vals.append(float(comp.j_m[0, 0]))
    vals = np.array(vals)
    assert np.all(np.isfinite(vals)) and np.all(vals > 0)
    assert np.all(np.diff(vals) > 0)
    assert vals[-1] - vals[-2] < vals[1] - vals[0]


# --- scene driver (ref: rt_run_canopy.jl:10-487) ---------------------------

def _scene(lai=1.5, albedo=0.1, g_override=None, n_layers=1,
           sensor_levels=None, n_z_atm=2):
    from vsmartmom.core.canopy import CanopyRTInputs, rt_run_canopy
    from vsmartmom.core.rt_run import BandRTInputs

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 40.0, [15.0], pol.n)
    n_spec = 3
    tau = np.full((n_z_atm, n_spec), 0.05) * (1 + np.arange(n_z_atm))[:, None]
    band = BandRTInputs(tau=tau, omega=np.full_like(tau, 0.95),
                        zw=np.ones((n_z_atm, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    canopy = CanopyRTInputs(lai=lai, rho_l=0.45, tau_l=0.35,
                            g_override=g_override, n_layers=n_layers)
    surf = {"type": "LambertianSurfaceScalar", "albedo": albedo}
    return pol, quad, band, canopy, surf, rt_run_canopy


def test_rt_run_canopy_g1_reduces_to_standard_scene():
    """G = 1 turns the canopy slab into a plain atmospheric layer with the
    bi-Lambertian phase: the scene driver must match rt_run_band on the
    equivalent 3-layer atmosphere (gate from VERDICT r4 / ref parity)."""
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    pol, quad, band, canopy, surf, rt_run_canopy = _scene(g_override=1.0)
    R_c, T_c, hdr, bhr_uw, bhr_dw = rt_run_canopy(
        pol, quad, band, canopy, [15.0], [30.0], 3, surf)

    gc_can, ssa = bilambertian_greek(canopy.rho_l, canopy.tau_l,
                                    canopy.n_moments)
    n_z, n_spec = band.tau.shape
    tau2 = np.vstack([band.tau, np.full((1, n_spec), canopy.lai)])
    omega2 = np.vstack([band.omega, np.full((1, n_spec), ssa)])
    zw2 = np.zeros((n_z + 1, 2, n_spec))
    zw2[:n_z, 0] = band.zw[:, 0]
    zw2[n_z, 1] = 1.0
    band2 = BandRTInputs(tau=tau2, omega=omega2, zw=zw2,
                         greeks=[band.greeks[0], gc_can])
    R_b, T_b, hdr_b, bhr_uw_b, bhr_dw_b = rt_run_band(
        pol, quad, band2, [15.0], [30.0], 3, surf, return_hdr=True)
    np.testing.assert_allclose(R_c, R_b, rtol=2e-7, atol=1e-12)
    np.testing.assert_allclose(T_c, T_b, rtol=2e-7, atol=1e-12)
    np.testing.assert_allclose(hdr, hdr_b, rtol=2e-7, atol=1e-12)
    np.testing.assert_allclose(bhr_uw, bhr_uw_b, rtol=2e-7)
    np.testing.assert_allclose(bhr_dw, bhr_dw_b, rtol=2e-7)


def test_rt_run_canopy_dense_lai_soil_independence():
    """LAI -> large: the soil becomes invisible — TOA reflectance and HDRF
    must be (nearly) independent of soil albedo, while a sparse canopy
    must show a clear soil signal."""
    pol, quad, band, canopy, surf, rt_run_canopy = _scene(lai=12.0,
                                                          albedo=0.05)
    R_dark, *_ = rt_run_canopy(pol, quad, band, canopy, [15.0], [30.0], 3,
                               surf)
    surf_bright = {"type": "LambertianSurfaceScalar", "albedo": 0.9}
    R_bright, *_ = rt_run_canopy(pol, quad, band, canopy, [15.0], [30.0],
                                 3, surf_bright)
    assert np.abs(R_bright - R_dark).max() / np.abs(R_dark).max() < 1e-3

    pol, quad, band, canopy_s, surf, rt_run_canopy = _scene(lai=0.3,
                                                            albedo=0.05)
    R_d2, *_ = rt_run_canopy(pol, quad, band, canopy_s, [15.0], [30.0], 3,
                             surf)
    R_b2, *_ = rt_run_canopy(pol, quad, band, canopy_s, [15.0], [30.0], 3,
                             surf_bright)
    assert np.abs(R_b2 - R_d2).max() / np.abs(R_d2).max() > 0.5


def test_rt_run_canopy_sensor_levels():
    """In-canopy sensors via interlayer coupling: with no atmosphere the
    upwelling field at canopy top == the TOA radiance, and the diffuse
    downwelling at canopy top is zero."""
    pol, quad, band, canopy, surf, rt_run_canopy = _scene(
        n_z_atm=0, n_layers=2, sensor_levels=[0, 1])
    out = rt_run_canopy(pol, quad, band, canopy, [15.0], [30.0], 3, surf,
                        sensor_levels=[0, 1])
    R, T, hdr, bhr_uw, bhr_dw, uw, dw = out
    np.testing.assert_allclose(uw[0], R, rtol=1e-8, atol=1e-14)
    assert np.abs(dw[0]).max() < 1e-12
    # mid-canopy downwelling diffuse is nonzero; upwelling below the top
    # is brighter than at the top looking down? (upwelling at the deeper
    # interface includes soil + lower canopy only - just check finite,
    # positive, and distinct from level 0)
    assert np.all(np.isfinite(uw[1])) and np.abs(dw[1]).max() > 0
    assert np.abs(uw[1] - uw[0]).max() > 0


def test_rt_run_canopy_brdf_soil():
    """RPV soil under the canopy: runs, finite, and reduces toward the
    Lambertian result when the RPV parameters approach Lambertian
    (k = 1, bigTheta = 0, rho_c = 1 -> constant rho0/pi reflectance)."""
    pol, quad, band, canopy, _, rt_run_canopy = _scene(lai=0.8)
    rpv_lamb = {"type": "rpvSurfaceScalar", "rho0": 0.3, "rho_c": 1.0,
                "k": 1.0, "theta": 0.0}
    R_rpv, *_ = rt_run_canopy(pol, quad, band, canopy, [15.0], [30.0], 3,
                              rpv_lamb)
    R_lam, *_ = rt_run_canopy(pol, quad, band, canopy, [15.0], [30.0], 3,
                              {"type": "LambertianSurfaceScalar",
                               "albedo": 0.3})
    assert np.all(np.isfinite(R_rpv))
    # quasi-Lambertian RPV: same leading-order reflectance (hotspot/angle
    # factors gone); few-percent agreement is the physical expectation
    assert np.abs(R_rpv - R_lam).max() / np.abs(R_lam).max() < 0.05
