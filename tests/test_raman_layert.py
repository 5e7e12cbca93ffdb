"""Per-layer-temperature Raman gates (ref: raman_atmo_prop.jl:14-160 —
the reference builds Raman single-scattering properties from each layer's
temperature, not a band mean).
"""
import numpy as np

import jax.numpy as jnp

from vsmartmom.core.rt import make_rsolve, vacuum_layer
from vsmartmom.core.rt_raman import (raman_interaction,
                                     raman_make_added_layer,
                                     rt_run_band_rrs, zero_ie)
from vsmartmom.core.rt_run import BandRTInputs
from vsmartmom.core.surface import lambertian_surface_layer
from vsmartmom.inelastic.rrs import make_rrs, make_rrs_profile
from vsmartmom.scattering.phase import (Polarization, compute_Z_moments,
                                        get_greek_rayleigh)
from vsmartmom.util.quadrature import rt_set_streams

GRID = np.arange(20500.0, 20530.0, 1.0)       # coarse UV-blue grid
T_LAYERS = [210.0, 285.0]


def _band(n_spec, n_z=2, seed=5):
    rng = np.random.default_rng(seed)
    tau_r = rng.uniform(0.1, 0.3, (n_z, n_spec))
    tau = tau_r + rng.uniform(0.0, 0.1, (n_z, n_spec))
    return BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)]), tau_r / tau


def test_profile_spec_shapes_and_t_sensitivity():
    rrs = make_rrs_profile(GRID, T_LAYERS)
    assert rrs.w_shift.shape == (2, rrs.n_raman)
    assert rrs.omega_cabannes.shape == (2,)
    # warmer layer populates higher J: weight distribution must differ
    dw = np.abs(rrs.w_shift[0] - rrs.w_shift[1]) / rrs.w_shift.max()
    assert dw.max() > 0.02, "few-% T sensitivity expected across 210-285 K"


def test_layered_weights_match_brute_force_composition():
    """rt_run_band_rrs with (nZ, nR) weights == manual per-layer
    composition using each layer's own weights (machine precision)."""
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 40.0, [0.0], pol.n)
    n = len(quad.qp_mu_n)
    band, f_rayl = _band(len(GRID))
    n_spec = len(GRID)
    rrs = make_rrs_profile(GRID, T_LAYERS)
    surf_d = {"type": "LambertianSurfaceScalar", "albedo": 0.2}

    R, T, ieR, ieT = rt_run_band_rrs(pol, quad, band, rrs, f_rayl,
                                     [0.0], [0.0], 1, surf_d)

    # manual composition with per-layer scalar-weight specs
    from vsmartmom.core.rt_raman import build_coupling
    rsolve = make_rsolve("lu")
    eye = jnp.broadcast_to(jnp.eye(n), (n_spec, n, n))
    z_pp, z_mp = compute_Z_moments(pol, quad.qp_mu, band.greeks[0], 0)
    z_pp_r, z_mp_r = compute_Z_moments(pol, quad.qp_mu, rrs.greek_raman, 0)
    i0_vec = np.zeros(n)
    i0_vec[quad.i_mu0_n:quad.i_mu0_n + 1] = pol.i0
    d_vec = jnp.asarray(np.tile(pol.d, quad.n_quad))
    mu0_node = float(quad.qp_mu_n[quad.i_mu0_n])
    wct2 = jnp.asarray(quad.wt_mu_n) / 2.0
    qp = jnp.asarray(quad.qp_mu_n)
    tau_sum = np.vstack([np.zeros((1, n_spec)),
                         np.cumsum(band.tau, axis=0)])

    comp = vacuum_layer(n_spec, n, jnp.float64)
    srcs0, valids0, _, gids0 = build_coupling(
        [make_rrs(GRID, T=T_LAYERS[0])], n_spec)
    comp_ie = zero_ie(srcs0.shape[0], n_spec, n, jnp.float64)
    for iz, t_l in enumerate(T_LAYERS):
        spec_z = make_rrs(GRID, T=t_l)        # scalar weights at layer T
        srcs, valids, ws, gids = build_coupling([spec_z], n_spec)
        lay, lay_ie = raman_make_added_layer(
            jnp.asarray(band.tau[iz]), jnp.asarray(band.omega[iz]),
            jnp.asarray(z_pp)[None], jnp.asarray(z_mp)[None],
            jnp.asarray(z_pp_r)[None], jnp.asarray(z_mp_r)[None],
            jnp.asarray(tau_sum[iz]), jnp.asarray(f_rayl[iz]),
            (jnp.asarray(srcs), jnp.asarray(valids)), jnp.asarray(ws),
            jnp.asarray(gids) * 0, qp, wct2, jnp.asarray(0.5),
            jnp.asarray(i0_vec), quad.i_mu0_n, 1, jnp.asarray(mu0_node),
            jnp.asarray(quad.mu0), d_vec, float(np.min(quad.qp_mu)), eye,
            rsolve)
        comp, comp_ie = raman_interaction(
            comp, comp_ie, lay, lay_ie,
            (jnp.asarray(srcs), jnp.asarray(valids)), eye, rsolve)
    surf = lambertian_surface_layer(
        0.2, n_spec, 1, qp, jnp.asarray(quad.wt_mu_n), jnp.asarray(i0_vec),
        jnp.asarray(tau_sum[-1]), jnp.asarray(quad.mu0), True, jnp.float64)
    comp, comp_ie = raman_interaction(
        comp, comp_ie, surf, zero_ie(srcs0.shape[0], n_spec, n,
                                     jnp.float64),
        (jnp.asarray(srcs0), jnp.asarray(valids0)), eye, rsolve)

    i_mu = int(np.argmin(np.abs(quad.qp_mu - 1.0)))
    j_m = np.asarray(comp.j_m)[:, i_mu]
    ie_m = np.asarray(comp_ie.j_m.sum(axis=0))[:, i_mu]
    np.testing.assert_allclose(R[0, 0], 0.5 * j_m, rtol=1e-12)
    np.testing.assert_allclose(ieR[0, 0], 0.5 * ie_m, rtol=1e-12)

    # and the layered run must differ from a uniform mean-T run
    rrs_mean = make_rrs(GRID, T=float(np.mean(T_LAYERS)))
    _, _, ieR_mean, _ = rt_run_band_rrs(pol, quad, band, rrs_mean, f_rayl,
                                        [0.0], [0.0], 1, surf_d)
    rel = np.abs(ieR_mean - ieR).max() / np.abs(ieR).max()
    assert rel > 1e-3, "per-layer T must change the filling-in"


def test_rrs_scheduled_schulz_matches_lu():
    """The production path's static scheduled-NS doubling (engaged for
    solver='schulz', bucketed per layer like the elastic engines) must
    reproduce the exact-LU traced path to Newton-Schulz convergence."""
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 40.0, [0.0], pol.n)
    band, f_rayl = _band(len(GRID))
    rrs = make_rrs(GRID, T=250.0)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    R0, T0, ieR0, ieT0 = rt_run_band_rrs(pol, quad, band, rrs, f_rayl,
                                         [0.0], [0.0], 2, surf,
                                         solver="lu")
    R1, T1, ieR1, ieT1 = rt_run_band_rrs(pol, quad, band, rrs, f_rayl,
                                         [0.0], [0.0], 2, surf,
                                         solver="schulz")
    assert np.abs(R1 - R0).max() / np.abs(R0).max() < 1e-6
    assert np.abs(ieR1 - ieR0).max() / np.abs(ieR0).max() < 1e-5
