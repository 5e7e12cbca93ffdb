"""Inelastic multi-sensor gates.

1. TOA/BOA consistency: sensor level 0 of rt_run_band_rrs_ms reproduces
   the TOA (R, ieR) of rt_run_band_rrs exactly (top slab = vacuum).
2. Interior sensor vs brute force: the factored ie interlayer flux equals
   the dense (2N x 2N) block-operator solution composed layer by layer.
"""
import numpy as np

import jax
import jax.numpy as jnp

from vsmartmom.core.rt import make_rsolve, vacuum_layer
from vsmartmom.core.rt_raman import (IELayer, ie_interlayer_flux,
                                     raman_interaction,
                                     raman_make_added_layer,
                                     rt_run_band_rrs, rt_run_band_rrs_ms,
                                     zero_ie)
from vsmartmom.core.rt_run import BandRTInputs
from vsmartmom.core.surface import lambertian_surface_layer
from vsmartmom.scattering.phase import (Polarization, compute_Z_moments,
                                        get_greek_rayleigh)
from vsmartmom.util.quadrature import rt_set_streams


def _band(n_spec=6, n_z=3, seed=0):
    rng = np.random.default_rng(seed)
    tau_r = rng.uniform(0.05, 0.2, (n_z, n_spec))
    tau = tau_r + rng.uniform(0.0, 0.15, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    f_rayl = tau_r / tau
    return band, f_rayl


class _Spec:
    """Minimal banded RRS coupling spec for the tests."""
    def __init__(self, shifts, ws, greek):
        self.i_shift = shifts
        self.w_shift = ws
        self.greek_raman = greek
        self.band_range = None


def test_toa_boa_sensors_match_single_sensor_run():
    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 35.0, [15.0], pol.n)
    band, f_rayl = _band()
    spec = _Spec([2, -1], [0.02, 0.03], get_greek_rayleigh(0.4))
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.15}
    vza, vaz = [15.0], [20.0]

    R, T, ieR, ieT = rt_run_band_rrs(pol, quad, band, spec, f_rayl, vza,
                                     vaz, 2, surf)
    uw, dw, ie_uw, ie_dw = rt_run_band_rrs_ms(
        pol, quad, band, spec, f_rayl, vza, vaz, 2, surf,
        sensor_levels=[0, band.tau.shape[0]])

    # TOA upwelling == the standard run's R/ieR
    np.testing.assert_allclose(uw[0], R, rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(ie_uw[0], ieR, rtol=1e-12, atol=1e-300)
    # physical: downwelling at BOA positive, ie filling-in nonzero
    assert np.all(dw[1][:, 0] > 0)
    assert np.abs(ie_dw[1]).max() > 0


def test_interior_sensor_vs_brute_force_blocks():
    """ie interlayer flux == dense 2Nx2N block solve, layer-composed."""
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 40.0, [0.0], pol.n)
    n = len(quad.qp_mu_n)
    band, f_rayl = _band(n_spec=7, n_z=2, seed=3)
    n_spec = 7
    shift = 2
    w_shift = 0.04
    greek_raman = get_greek_rayleigh(0.4)

    rsolve = make_rsolve("lu")
    eye = jnp.broadcast_to(jnp.eye(n), (n_spec, n, n))
    z_pp, z_mp = compute_Z_moments(pol, quad.qp_mu, band.greeks[0], 0)
    z_pp_r, z_mp_r = compute_Z_moments(pol, quad.qp_mu, greek_raman, 0)
    i0_vec = np.zeros(n)
    i0_vec[quad.i_mu0_n:quad.i_mu0_n + 1] = pol.i0
    d_vec = jnp.asarray(np.tile(pol.d, quad.n_quad))
    mu0_node = float(quad.qp_mu_n[quad.i_mu0_n])
    wct2 = jnp.asarray(quad.wt_mu_n) / 2.0
    qp = jnp.asarray(quad.qp_mu_n)
    shifts = jnp.asarray([shift], jnp.int32)
    ws = jnp.asarray([w_shift])
    gids = jnp.asarray([0], jnp.int32)

    tau_sum = np.vstack([np.zeros((1, n_spec)),
                         np.cumsum(band.tau, axis=0)])
    layers = []
    for iz in range(2):
        lay, lay_ie = raman_make_added_layer(
            jnp.asarray(band.tau[iz]), jnp.asarray(band.omega[iz]),
            jnp.asarray(z_pp)[None], jnp.asarray(z_mp)[None],
            jnp.asarray(z_pp_r)[None], jnp.asarray(z_mp_r)[None],
            jnp.asarray(tau_sum[iz]), jnp.asarray(f_rayl[iz]), shifts, ws,
            gids, qp, wct2, jnp.asarray(0.5), jnp.asarray(i0_vec),
            quad.i_mu0_n, 1, jnp.asarray(mu0_node), jnp.asarray(quad.mu0),
            d_vec, float(np.min(quad.qp_mu)), eye, rsolve)
        layers.append((lay, lay_ie))

    surf = lambertian_surface_layer(
        0.2, n_spec, 1, qp, jnp.asarray(quad.wt_mu_n),
        jnp.asarray(i0_vec), jnp.asarray(tau_sum[-1]),
        jnp.asarray(quad.mu0), True, jnp.float64)
    surf_ie = zero_ie(1, n_spec, n, jnp.float64)

    # factored path: sensor at level 1 (between the two layers)
    top, top_ie = layers[0]
    bot, bot_ie = raman_interaction(layers[1][0], layers[1][1], surf,
                                    surf_ie, shifts, eye, rsolve)
    uw, dw, ie_uw, ie_dw = ie_interlayer_flux(top, top_ie, bot, bot_ie,
                                              shifts, eye, rsolve)

    # brute force in dense block space per output wavelength
    def to_np(lay, lay_ie):
        return ([np.asarray(getattr(lay, f)) for f in
                 ("r_mp", "r_pm", "t_pp", "t_mm", "j_p", "j_m")],
                [np.asarray(getattr(lay_ie, f))[0] for f in
                 ("r_mp", "r_pm", "t_pp", "t_mm", "j_p", "j_m")])

    for n1 in range(n_spec):
        n0 = n1 + shift
        if not (0 <= n0 < n_spec):
            continue
        Z = np.zeros((n, n))

        def blk(x, xie):
            return np.block([[x[n1], xie[n1]], [Z, x[n0]]])

        def vblk(v, vie):
            return np.concatenate([vie[n1], v[n0]])

        def compose(topb, botb):
            """Block adding: top over bottom (matches rt.interaction)."""
            (r1, p1, tp1, tm1, jp1, jm1) = topb
            (r2, p2, tp2, tm2, jp2, jm2) = botb
            I2 = np.eye(2 * n)
            t01 = tm1 @ np.linalg.inv(I2 - r2 @ p1)
            t21 = tp2 @ np.linalg.inv(I2 - p1 @ r2)
            return (r1 + t01 @ r2 @ tp1,
                    p2 + t21 @ p1 @ tm2,
                    t21 @ tp1,
                    t01 @ tm2,
                    jp2 + t21 @ (jp1 + p1 @ jm2),
                    jm1 + t01 @ (r2 @ jp1 + jm2))

        def as_blocks(lay, lay_ie):
            e, ie = to_np(lay, lay_ie)
            return (blk(e[0], ie[0]), blk(e[1], ie[1]), blk(e[2], ie[2]),
                    blk(e[3], ie[3]), vblk(e[4], ie[4]), vblk(e[5], ie[5]))

        surf_np, surf_ie_np = to_np(surf, surf_ie)
        botb = compose(as_blocks(*layers[1]),
                       (blk(surf_np[0], surf_ie_np[0]),
                        blk(surf_np[1], surf_ie_np[1]),
                        blk(surf_np[2], surf_ie_np[2]),
                        blk(surf_np[3], surf_ie_np[3]),
                        vblk(surf_np[4], surf_ie_np[4]),
                        vblk(surf_np[5], surf_ie_np[5])))
        topb = as_blocks(*layers[0])

        I2 = np.eye(2 * n)
        dw_b = np.linalg.solve(I2 - topb[1] @ botb[0],
                               topb[4] + topb[1] @ botb[5])
        uw_b = np.linalg.solve(I2 - botb[0] @ topb[1],
                               botb[5] + botb[0] @ topb[4])

        np.testing.assert_allclose(np.asarray(ie_dw)[0, n1], dw_b[:n],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(ie_uw)[0, n1], uw_b[:n],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(dw)[n0], dw_b[n:],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(uw)[n0], uw_b[n:],
                                   rtol=1e-10, atol=1e-14)
