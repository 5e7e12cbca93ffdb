"""Aerosol-microphysics autodiff gates.

The JAX Mie -> NAI2 -> Greek chain (scattering/mie_ad.py) must (a) agree
with the f64 numpy path to machine precision, (b) produce forward-mode
derivatives matching finite differences, and (c) support a retrieval of
perturbed (mu, n_r) through the full RT — the reference's
phase_function_autodiff.jl + AD_OCO2 retrieval seam.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom.scattering.mie import Aerosol
from vsmartmom.scattering.mie_ad import (aerosol_optics_with_derivs,
                                         greek_stack_jax, make_setup)
from vsmartmom.scattering.nai2 import compute_aerosol_optical_properties

LAM, R_MAX, NQ = 0.55, 6.0, 40
THETA0 = (0.3, 1.8, 1.45, 0.001)


def test_jax_chain_matches_numpy():
    aero = Aerosol(*THETA0)
    ref = compute_aerosol_optical_properties(aero, LAM, R_MAX, NQ)
    opt, der = aerosol_optics_with_derivs(*THETA0, LAM, R_MAX, NQ)
    np.testing.assert_allclose(opt.ssa, ref.ssa, rtol=1e-12)
    np.testing.assert_allclose(opt.k, ref.k, rtol=1e-12)
    for nm in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta"):
        np.testing.assert_allclose(getattr(opt.greek_coefs, nm),
                                   getattr(ref.greek_coefs, nm),
                                   atol=1e-12)
    assert der["d_greeks"].shape[0] == 4
    assert der["d_ssa"].shape == (4,)


def test_derivatives_match_finite_differences():
    setup = make_setup(LAM, R_MAX, NQ)
    th0 = jnp.asarray(THETA0, jnp.float64)

    def f(th):
        greeks, ssa, k = greek_stack_jax(setup, th)
        return jnp.concatenate([greeks[1, :6], jnp.array([ssa, k])])

    jac = jax.jacfwd(f)(th0)
    for i, eps in enumerate((1e-7, 1e-7, 1e-7, 1e-8)):
        dv = jnp.zeros(4).at[i].set(eps)
        fd = (f(th0 + dv) - f(th0 - dv)) / (2 * eps)
        np.testing.assert_allclose(jac[:, i], fd, rtol=2e-5, atol=5e-8)


def test_retrieval_through_full_rt():
    """Gauss-Newton recovery of perturbed (mu, n_r) from TOA radiances:
    the full differentiable chain Mie -> Greek -> Z -> layer RT -> R.
    (ref: AD_OCO2_test.jl:71-160 retrieves log-AOD/albedo/vmr through the
    same seam.)"""
    from vsmartmom.core.rt import (interaction, make_added_layer,
                                  rsolve_lu, vacuum_layer)
    from vsmartmom.core.surface import lambertian_surface_layer
    from vsmartmom.scattering.phase import (Polarization,
                                            compute_Z_moments_jax,
                                            get_greek_rayleigh, make_z_cache)
    from vsmartmom.util.quadrature import rt_set_streams

    setup = make_setup(LAM, R_MAX, NQ)
    pol = Polarization.from_name("Stokes_I")
    vza = [10.0, 30.0, 50.0]
    quad = rt_set_streams("GaussQuadFullSphere", 8, 40.0, vza, pol.n)
    n = len(quad.qp_mu_n)
    l_full = 2 * setup.n_max - 1
    caches = [make_z_cache(pol, quad.qp_mu, l_full, m) for m in range(2)]
    gr = get_greek_rayleigh(0.0)
    rayl_stack = np.zeros((6, l_full))
    for i, nm in enumerate(("alpha", "beta", "gamma", "delta", "epsilon",
                            "zeta")):
        rayl_stack[i, :3] = getattr(gr, nm)
    rayl_stack = jnp.asarray(rayl_stack)

    tau_rayl, tau_aer_ref = 0.05, 0.3
    i0 = np.zeros(n)
    i0[quad.i_mu0_n:quad.i_mu0_n + pol.n] = pol.i0
    d_vec = jnp.asarray(np.tile(pol.d, quad.n_quad))
    mu0_node = float(quad.qp_mu_n[quad.i_mu0_n])
    min_mu = float(np.min(quad.qp_mu))
    i_vza = [int(np.argmin(np.abs(quad.qp_mu - np.cos(np.deg2rad(v)))))
             for v in vza]

    def forward(theta):
        mu_g, n_r = theta
        greeks, ssa, k = greek_stack_jax(
            setup, jnp.array([mu_g, 1.8, n_r, 0.001]))
        tau_aer = tau_aer_ref            # fixed AOD; shape params retrieved
        tau = jnp.array([tau_rayl + tau_aer])
        omega = (tau_rayl + ssa * tau_aer) / tau
        w_rayl = tau_rayl / (tau_rayl + ssa * tau_aer)
        out = []
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (1, n, n))
        for m in range(2):
            z_pp_r, z_mp_r = compute_Z_moments_jax(rayl_stack, caches[m])
            z_pp_a, z_mp_a = compute_Z_moments_jax(greeks, caches[m])
            z_pp = (w_rayl * z_pp_r + (1 - w_rayl) * z_pp_a)[None]
            z_mp = (w_rayl * z_mp_r + (1 - w_rayl) * z_mp_a)[None]
            wct2 = (quad.wt_mu_n / 2.0 if m == 0 else quad.wt_mu_n / 4.0)
            lay = make_added_layer(
                tau, omega, z_pp, z_mp, jnp.zeros(1),
                jnp.asarray(quad.qp_mu_n), jnp.asarray(wct2),
                jnp.asarray(0.5 if m == 0 else 0.25), jnp.asarray(i0),
                quad.i_mu0_n, pol.n, jnp.asarray(mu0_node),
                jnp.asarray(quad.mu0), d_vec, min_mu, eye,
                rsolve=rsolve_lu)
            surf = lambertian_surface_layer(
                0.1, 1, pol.n, jnp.asarray(quad.qp_mu_n),
                jnp.asarray(quad.wt_mu_n), jnp.asarray(i0), tau,
                jnp.asarray(quad.mu0), m == 0, jnp.float64)
            comp = interaction(vacuum_layer(1, n, jnp.float64), lay, eye,
                               rsolve=rsolve_lu)
            comp = interaction(comp, surf, eye, rsolve=rsolve_lu)
            weight = 0.5 if m == 0 else 1.0
            out.append(weight * jnp.stack(
                [comp.j_m[0, iv] for iv in i_vza]))
        return out[0] + out[1]            # vaz = 0 synthesis

    theta_true = jnp.array([0.30, 1.45])
    y_obs = forward(theta_true)

    theta = jnp.array([0.36, 1.40])       # perturbed start
    for _ in range(8):
        r = forward(theta) - y_obs
        J = jax.jacfwd(forward)(theta)
        step = jnp.linalg.lstsq(J, -r)[0]
        theta = theta + jnp.clip(step, -0.05, 0.05)
    err = np.abs(np.asarray(theta - theta_true))
    assert err[0] < 1e-5 and err[1] < 1e-5, (theta, err)
