"""Vegetation-canopy RT: directional cross-section (G) layers.

The reference's experimental canopy mode (ref: src/CoreRT/rt_run_canopy.jl,
CoreKernel/elemental_canopy.jl, types.jl:613-624
CoreDirectionalScatteringOpticalProperties) attenuates along each stream
with the Ross projection factor G(mu) — the mean leaf-area cross-section
seen from direction mu — and scatters with a bi-Lambertian leaf phase
function (the reference pulls both from CanopyOptics.jl; here they are
implemented directly: Ross-Goudriaan G and the classic uniform-LAD
bi-Lambertian area scattering phase function, Shultis & Myneni 1988).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom.core.rt import (LayerRT, bmv, doubling, doubling_number,
                               rsolve_lu)
from vsmartmom.scattering.phase import GreekCoefs


def ross_g(mu, chi: float = 0.0):
    """Ross-Goudriaan projection factor G(mu) for a leaf angle
    distribution parameterized by chi (0 = spherical -> G = 0.5;
    chi -> +1 planophile, chi -> -1 erectophile).
    """
    mu = np.asarray(mu, dtype=np.float64)
    chi = float(np.clip(chi, -0.4, 0.6))
    phi1 = 0.5 - 0.633 * chi - 0.33 * chi**2
    phi2 = 0.877 * (1.0 - 2.0 * phi1)
    return phi1 + phi2 * mu


def bilambertian_greek(rho_l: float, tau_l: float,
                       n_moments: int = 16) -> tuple:
    """Greek (Legendre-beta) expansion of the bi-Lambertian uniform-LAD
    area scattering phase function

        Gamma(beta) = (rho+tau)/(3 pi) (sin b - b cos b) + tau/3 cos b

    normalized so the 0th moment of p = 4 Gamma / (rho + tau) is 1.
    Returns (GreekCoefs (intensity-only), ssa = rho_l + tau_l).
    """
    from numpy.polynomial.legendre import leggauss, legvander
    assert rho_l >= 0 and tau_l >= 0 and rho_l + tau_l <= 1.0
    x, w = leggauss(256)                     # x = cos(beta)
    b = np.arccos(x)
    gamma = ((rho_l + tau_l) / (3.0 * np.pi)
             * (np.sin(b) - b * np.cos(b)) + tau_l / 3.0 * np.cos(b))
    p = 4.0 * gamma / max(rho_l + tau_l, 1e-12)
    ls = np.arange(n_moments)
    beta = (2 * ls + 1) / 2.0 * (legvander(x, n_moments - 1).T @ (w * p))
    beta = beta / beta[0]
    z = np.zeros(n_moments)
    gc = GreekCoefs(alpha=z, beta=beta, gamma=z, delta=beta.copy(),
                    epsilon=z, zeta=z)
    return gc, rho_l + tau_l


def elemental_directional(dtau, omega, z_pp, z_mp, g_proj, qp, wct2, wct02,
                          tau_sum, i0_vec, i_mu0_n, n_stokes, mu0_node):
    """Single-scattering init with per-stream projection factors G(mu).

    G == 1 reduces exactly to rt.elemental. ref: elemental_canopy.jl
    get_canopy_elem_rt!/..._SFI! (:63-160); dtau/omega (nSpec,),
    g_proj (N,) per Stokes-replicated stream.
    """
    dt = dtau[:, None, None]
    om = omega[:, None, None]
    mu_i = qp[:, None]
    mu_j = qp[None, :]
    g_i = g_proj[:, None]
    g_j = g_proj[None, :]
    same_mu = mu_i == mu_j
    eye = jnp.eye(qp.shape[0], dtype=bool)
    col_mask = wct2 > 1e-8

    # Scattering carries the incident-direction projection G(Omega_j): the
    # leaf area intercepts ~G(Omega') of the incoming beam and scatters
    # omega_leaf of it; our Z is a beta_0 = 1-normalized phase matrix (the
    # reference's CanopyOptics Gamma absorbs this factor instead). Without
    # it the effective per-path albedo is omega/G > 1 and doubling
    # diverges.
    r_mp = (om * g_j * z_mp * (mu_j / (mu_i * g_j + mu_j * g_i))
            * wct2[None, None, :]
            * (-jnp.expm1(-dt * (g_i / mu_i + g_j / mu_j))))
    r_mp = jnp.where(col_mask[None, None, :], r_mp, 0.0)

    exp_i = jnp.exp(-dt * g_i / mu_i)
    t_diag = exp_i * (1.0 + om * g_i * z_pp * (dt / mu_i)
                      * wct2[None, None, :])
    denom = jnp.where(same_mu, 1.0, mu_i * g_j - mu_j * g_i)
    exp_diff = (jnp.exp(-dt * g_j / mu_j)
                * jnp.expm1(dt * (g_j / mu_j - g_i / mu_i)))
    t_off = om * g_j * z_pp * (mu_j / denom) * wct2[None, None, :] * exp_diff
    t_pp = jnp.where(same_mu[None, :, :],
                     jnp.where(eye[None, :, :], t_diag, 0.0), t_off)
    t_pp = jnp.where(col_mask[None, None, :], t_pp,
                     jnp.where(eye[None, :, :],
                               exp_i * jnp.ones_like(t_pp), 0.0))

    # SFI sources with G-projected solar attenuation
    n_spec = dtau.shape[0]
    z_pp_i0 = bmv(jnp.broadcast_to(z_pp, (n_spec,) + z_pp.shape[-2:]),
                  jnp.broadcast_to(i0_vec, (n_spec, i0_vec.shape[0])))
    z_mp_i0 = bmv(jnp.broadcast_to(z_mp, (n_spec,) + z_mp.shape[-2:]),
                  jnp.broadcast_to(i0_vec, (n_spec, i0_vec.shape[0])))
    idx = jnp.arange(qp.shape[0])
    in_block = (idx >= i_mu0_n) & (idx < i_mu0_n + n_stokes)
    g0 = g_proj[i_mu0_n]

    mu_iv = qp[None, :]
    g_iv = g_proj[None, :]
    dt_v = dtau[:, None]
    denom0 = jnp.where(in_block[None, :], 1.0,
                       mu_iv * g0 - mu0_node * g_iv)
    exp_diff0 = (jnp.exp(-dt_v * g0 / mu0_node)
                 * jnp.expm1(dt_v * (g0 / mu0_node - g_iv / mu_iv)))
    j_p = jnp.where(
        in_block[None, :],
        (dt_v / mu_iv) * jnp.exp(-dt_v * g_iv / mu_iv),
        (mu0_node / denom0) * exp_diff0)
    j_p = wct02 * omega[:, None] * g0 * z_pp_i0 * j_p
    j_m = (wct02 * omega[:, None] * g0 * z_mp_i0
           * (mu0_node / (mu_iv * g0 + mu0_node * g_iv))
           * (-jnp.expm1(-dt_v * (g_iv / mu_iv + g0 / mu0_node))))

    atten = jnp.exp(-tau_sum * g0 / mu0_node)[:, None]
    return r_mp, t_pp, j_p * atten, j_m * atten


def make_canopy_layer(tau, omega, z_pp, z_mp, g_proj, tau_sum, qp, wct2,
                      wct02, i0_vec, i_mu0_n, n_stokes, mu0_node, mu0,
                      d_vec, min_qp_mu, eye, rsolve=rsolve_lu) -> LayerRT:
    """Canopy slab: directional elemental + doubling (ref:
    rt_kernel.jl:248-267 G-aware dtau/expk)."""
    dtype = tau.dtype
    tau_scat_max = jnp.max(tau * omega)
    # Elemental step 0.004*min(mu): single-scatter error O((dtau/mu)^2)
    # stays < ~3e-5 of radiance (measured f64), 2 fewer doublings/layer
    # than the reference's 0.001 factor (~20% of TPU runtime).
    dtau_max = jnp.minimum(tau_scat_max, 0.004 * min_qp_mu)
    ndoubl = doubling_number(dtau_max, tau_scat_max)
    scale = 2.0 ** ndoubl.astype(dtype)
    dtau = tau / scale
    g0 = g_proj[i_mu0_n]
    expk = jnp.exp(-dtau * g0 / mu0)

    r_mp, t_pp, j_p, j_m = elemental_directional(
        dtau, omega, z_pp, z_mp, g_proj, qp, wct2, wct02, tau_sum,
        i0_vec, i_mu0_n, n_stokes, mu0_node)

    r_f = d_vec[None, :, None] * r_mp
    jm_f = d_vec[None, :] * j_m
    r_f, t_pp, j_p, jm_f = doubling(r_f, t_pp, j_p, jm_f, expk, ndoubl,
                                    eye, rsolve=rsolve)
    r_mp = d_vec[None, :, None] * r_f
    j_m = d_vec[None, :] * jm_f
    sgn = d_vec[None, :, None] * d_vec[None, None, :]
    return LayerRT(r_mp=r_mp, r_pm=sgn * r_mp, t_pp=t_pp, t_mm=sgn * t_pp,
                   j_p=j_p, j_m=j_m)
