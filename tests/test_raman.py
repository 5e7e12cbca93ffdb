"""Inelastic (RRS) gates.

1. Algebra gate: the factored (vmapped-over-shifts) Raman doubling and
   interaction must match brute-force composition of the full (2N x 2N)
   upper-triangular block matrices to machine precision.
2. Physics gates: spectral-line positions/weights, Cabannes fraction,
   energy conservation (flat spectrum -> elastic + ie == full Rayleigh run)
   and Ring-effect filling-in at an absorption line.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsmartmom.core.rt import elemental, make_rsolve, vacuum_layer
from vsmartmom.core.rt_raman import (IELayer, ie_elemental, raman_doubling,
                                     raman_interaction, roll0, zero_ie)
from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
from vsmartmom.inelastic.rrs import make_rrs
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams


def _setup_small(n_spec=7, shift=2, seed=0):
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 40.0, [0.0], pol.n)
    n = len(quad.qp_mu_n)
    rng = np.random.default_rng(seed)
    tau = rng.uniform(0.05, 0.4, n_spec)
    omega = rng.uniform(0.5, 0.95, n_spec)
    f_rayl = rng.uniform(0.3, 0.9, n_spec)
    gc = get_greek_rayleigh(0.05)
    from vsmartmom.scattering.phase import compute_Z_moments
    z_pp, z_mp = compute_Z_moments(pol, quad.qp_mu, gc, 0)
    return pol, quad, n, tau, omega, f_rayl, z_pp, z_mp


def test_raman_algebra_vs_brute_force():
    """Factored ie doubling+interaction == dense 2Nx2N block composition."""
    pol, quad, n, tau, omega, f_rayl, z_pp, z_mp = _setup_small()
    n_spec = len(tau)
    shift = 2
    w_shift = 0.03
    mu0_node = float(quad.qp_mu_n[quad.i_mu0_n])
    i0_vec = np.zeros(n)
    i0_vec[quad.i_mu0_n:quad.i_mu0_n + 1] = pol.i0
    d_vec = np.tile(pol.d, quad.n_quad)
    qp = jnp.asarray(quad.qp_mu_n)
    wct2 = jnp.asarray(quad.wt_mu_n) / 2.0
    wct02 = 0.5
    tau_sum = jnp.zeros(n_spec)
    dtau = jnp.asarray(tau) / 8.0       # pretend ndoubl = 3
    ek = jnp.exp(-dtau / quad.mu0)
    rsolve = make_rsolve("lu")
    eye = jnp.broadcast_to(jnp.eye(n), (n_spec, n, n))

    r, t, jp, jm = elemental(dtau, jnp.asarray(omega), z_pp[None],
                             z_mp[None], qp, wct2, wct02,
                             tau_sum, jnp.asarray(i0_vec), quad.i_mu0_n,
                             1, mu0_node)
    ier, iet, iejp, iejm = ie_elemental(
        shift, w_shift, dtau, jnp.asarray(f_rayl), tau_sum, jnp.asarray(z_pp),
        jnp.asarray(z_mp), qp, wct2, wct02, jnp.asarray(i0_vec),
        quad.i_mu0_n, 1, mu0_node)

    # --- factored result (D-flips irrelevant for Stokes I: d_vec = 1) ----
    n_doubl = 3
    shifts = jnp.asarray([shift], jnp.int32)
    out = raman_doubling(r, t, jp, jm, ek, ier[None], iet[None],
                         iejp[None], iejm[None], shifts, n_doubl, eye,
                         rsolve)
    rf, tf, jpf, jmf, _, ierf, ietf, iejpf, iejmf = out

    # --- brute force: dense block matrices per output index n1 -----------
    r_, t_, jp_, jm_ = map(np.asarray, (r, t, jp, jm))
    ier_, iet_, iejp_, iejm_ = map(np.asarray, (ier, iet, iejp, iejm))
    ek_ = np.asarray(ek)
    for n1 in range(n_spec):
        n0 = n1 + shift
        if not (0 <= n0 < n_spec):
            continue
        Z = np.zeros((n, n))

        def blk(m1, mie, m0):
            return np.block([[m1, mie], [Z, m0]])

        Rb = blk(r_[n1], ier_[n1], r_[n0])
        Tb = blk(t_[n1], iet_[n1], t_[n0])
        Jp = np.concatenate([jp_[n1] * 0 + iejp_[n1], jp_[n0]])
        Jm = np.concatenate([iejm_[n1], jm_[n0]])
        # NOTE: block source = [ie part; elastic(n0)]; the elastic n1 part
        # evolves independently and is checked via rf/jpf anyway.
        Ek = np.concatenate([np.full(n, ek_[n1]), np.full(n, ek_[n0])])
        I2 = np.eye(2 * n)
        for _ in range(n_doubl):
            gp = np.linalg.inv(I2 - Rb @ Rb)
            tt = Tb @ gp
            j1p = Jp * Ek
            j1m = Jm * Ek
            Jm = Jm + tt @ (j1m + Rb @ Jp)
            Jp = j1p + tt @ (Jp + Rb @ j1m)
            Rb = Rb + tt @ Rb @ Tb
            Tb = tt @ Tb
            Ek = Ek * Ek

        np.testing.assert_allclose(np.asarray(ierf)[0, n1], Rb[:n, n:],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(ietf)[0, n1], Tb[:n, n:],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(iejmf)[0, n1], Jm[:n],
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(iejpf)[0, n1], Jp[:n],
                                   rtol=1e-10, atol=1e-14)
        # elastic block consistency
        np.testing.assert_allclose(np.asarray(rf)[n1], Rb[:n, :n],
                                   rtol=1e-10, atol=1e-14)

    # --- interaction gate: compose two such layers -----------------------
    comp = vacuum_layer(n_spec, n, jnp.float64)
    comp_ie = zero_ie(1, n_spec, n, jnp.float64)
    from vsmartmom.core.rt import LayerRT
    lay = LayerRT(r_mp=rf, r_pm=rf, t_pp=tf, t_mm=tf, j_p=jpf, j_m=jmf)
    lay_ie = IELayer(ierf, ierf, ietf, ietf, iejpf, iejmf)
    c1, c1_ie = raman_interaction(comp, comp_ie, lay, lay_ie, shifts, eye,
                                  rsolve)
    c2, c2_ie = raman_interaction(c1, c1_ie, lay, lay_ie, shifts, eye,
                                  rsolve)

    rf_, tf_, jpf_, jmf_ = map(np.asarray, (c2.r_mp, c2.t_pp, c2.j_p,
                                            c2.j_m))
    for n1 in range(n_spec):
        n0 = n1 + shift
        if not (0 <= n0 < n_spec):
            continue
        Z = np.zeros((n, n))

        def blk(x, xie, idx1=n1, idx0=n0):
            return np.block([[np.asarray(x)[idx1],
                              np.asarray(xie)[0, idx1]],
                             [Z, np.asarray(x)[idx0]]])

        Rmp = blk(lay.r_mp, lay_ie.r_mp)
        Rpm = blk(lay.r_pm, lay_ie.r_pm)
        Tpp = blk(lay.t_pp, lay_ie.t_pp)
        Tmm = blk(lay.t_mm, lay_ie.t_mm)
        Jp = np.concatenate([np.asarray(lay_ie.j_p)[0, n1],
                             np.asarray(lay.j_p)[n0]])
        Jm = np.concatenate([np.asarray(lay_ie.j_m)[0, n1],
                             np.asarray(lay.j_m)[n0]])
        I2 = np.eye(2 * n)
        # dense adding of two identical slabs (comp = first, added = second)
        t01 = Tmm @ np.linalg.inv(I2 - Rmp @ Rpm)
        jm_new = Jm + t01 @ (Rmp @ Jp + Jm)
        rmp_new = Rmp + t01 @ Rmp @ Tpp
        tmm_new = t01 @ Tmm
        t21 = Tpp @ np.linalg.inv(I2 - Rpm @ Rmp)
        jp_new = Jp + t21 @ (Jp + Rpm @ Jm)
        tpp_new = t21 @ Tpp
        np.testing.assert_allclose(np.asarray(c2_ie.r_mp)[0, n1],
                                   rmp_new[:n, n:], rtol=1e-9, atol=1e-14)
        np.testing.assert_allclose(np.asarray(c2_ie.t_pp)[0, n1],
                                   tpp_new[:n, n:], rtol=1e-9, atol=1e-14)
        np.testing.assert_allclose(np.asarray(c2_ie.j_m)[0, n1],
                                   jm_new[:n], rtol=1e-9, atol=1e-13)
        np.testing.assert_allclose(np.asarray(c2_ie.j_p)[0, n1],
                                   jp_new[:n], rtol=1e-9, atol=1e-13)


def _rrs_band(tau_abs_center=0.0):
    """Pure-Rayleigh band (optionally with a gaussian absorption line).

    The grid must span the full +-~200 cm^-1 rotational Raman shift range
    so every source wavelength of the band center lies inside; coarse
    6 cm^-1 spacing keeps the test fast."""
    grid = np.arange(12740.0, 13268.0, 6.0)
    n_spec = len(grid)
    rrs = make_rrs(grid, T=250.0)
    tau_rayl = np.full((2, n_spec), 0.15)
    tau_abs = tau_abs_center * np.exp(
        -0.5 * ((np.arange(n_spec) - n_spec // 2) / 1.0) ** 2)
    tau = tau_rayl + tau_abs[None, :]
    f_rayl = tau_rayl / tau
    band_cab = BandRTInputs(
        tau=tau, omega=tau_rayl * rrs.omega_cabannes / tau,
        zw=np.ones((2, 1, n_spec)),
        greeks=[get_greek_rayleigh(rrs.depol_rayl)])
    band_full = BandRTInputs(
        tau=tau, omega=tau_rayl / tau, zw=np.ones((2, 1, n_spec)),
        greeks=[get_greek_rayleigh(rrs.depol_rayl)])
    return grid, rrs, band_cab, band_full, f_rayl


def test_rrs_energy_conservation_flat_spectrum():
    """Flat spectrum: Cabannes-only + Raman-filling == full-Rayleigh run
    away from the band edges (first-order redistribution conserves)."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    grid, rrs, band_cab, band_full, f_rayl = _rrs_band()

    R_cab, T_cab, ieR, ieT = rt_run_band_rrs(
        pol, quad, band_cab, rrs, f_rayl, [0.0], [0.0], 2, surf)
    R_full, _ = rt_run_band(pol, quad, band_full, [0.0], [0.0], 2, surf)

    c = len(grid) // 2
    # at band center (all Raman sources inside the grid) the sum must
    # reproduce the full-Rayleigh elastic radiance to ~first order
    total = R_cab[0, 0, c] + ieR[0, 0, c]
    assert total == pytest.approx(R_full[0, 0, c], rel=2e-3)
    # and the filling-in is strictly positive and ~the Raman fraction
    assert ieR[0, 0, c] > 0
    assert 0.01 < ieR[0, 0, c] / R_cab[0, 0, c] < 0.06


def test_rrs_ring_effect_filling_in():
    """An absorption line is 'filled in': the relative Raman contribution
    is larger at the line core than in the continuum (Ring effect)."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    grid, rrs, band_cab, band_full, f_rayl = _rrs_band(tau_abs_center=2.0)

    R_cab, _, ieR, _ = rt_run_band_rrs(
        pol, quad, band_cab, rrs, f_rayl, [0.0], [0.0], 2, surf)
    c = len(grid) // 2
    fill_core = ieR[0, 0, c] / R_cab[0, 0, c]
    fill_cont = ieR[0, 0, 2] / R_cab[0, 0, 2]
    assert fill_core > fill_cont * 1.2


def test_rrs_mapping_physics():
    grid = np.arange(12800.0, 13200.0, 0.5)
    rrs = make_rrs(grid, T=250.0)
    # Cabannes fraction in the O2 A-band region: ~0.96-0.97
    assert 0.95 < rrs.omega_cabannes < 0.98
    # energy closure: sum of coupling weights == (1-c)/c of total Rayleigh
    expect = (1 - rrs.omega_cabannes) / rrs.omega_cabannes
    assert rrs.w_shift.sum() == pytest.approx(expect, rel=2e-3)
    # shifts are symmetric and within +-~200 cm^-1 (400 grid steps)
    assert rrs.i_shift.min() > -800 and rrs.i_shift.max() < 800
    assert np.all(rrs.w_shift > 0)


def test_vs_vibrational_raman():
    """VS (vibrational Raman) through the multi-group driver: physically
    sized, positive filling only where the +2331/1556 cm^-1-shifted source
    lies inside the grid."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    from vsmartmom.inelastic.rrs import make_vs

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    grid = np.arange(10500.0, 13300.0, 20.0)
    n_spec = len(grid)
    specs = make_vs(grid, T=250.0, direction="0to1")
    assert len(specs) == 3          # rovib O/S + Q(N2) + Q(O2)

    tau_rayl = np.full((2, n_spec), 0.1)
    band = BandRTInputs(tau=tau_rayl, omega=np.ones_like(tau_rayl),
                        zw=np.ones((2, 1, n_spec)),
                        greeks=[get_greek_rayleigh(specs[0].depol_rayl)])
    R, T, ieR, ieT = rt_run_band_rrs(pol, quad, band, specs,
                                     np.ones_like(tau_rayl), [0.0], [0.0],
                                     2, surf)
    assert np.all(np.isfinite(ieR))
    max_shift = max(int(s.i_shift.max()) for s in specs)
    # outputs whose source would fall beyond the red edge see no VS
    fill = ieR[0, 0, :] / R[0, 0, :]
    assert np.all(ieR[0, 0, n_spec - 1:] >= 0)
    valid = fill[: n_spec - max_shift - 1]
    # vibrational filling is ~1e-4 of the elastic signal
    assert 1e-5 < np.median(valid) < 5e-3
    # and zero where no source wavelength exists in the grid
    min_shift = min(int(s.i_shift.min()) for s in specs)
    assert np.max(np.abs(fill[n_spec - min_shift:])) < 1e-12 \
        if n_spec - min_shift < n_spec else True


def test_vs_anti_stokes_negligible_cold():
    """VS 1->0 from a cold atmosphere is Boltzmann-suppressed: ~1.5e-6 for
    N2 (2331 cm^-1) and ~1.3e-4 for O2 (1556 cm^-1) at 250 K, so the total
    is ~1e-4 of the Stokes direction."""
    from vsmartmom.inelastic.rrs import make_vs
    grid = np.arange(10500.0, 13300.0, 20.0)
    s01 = make_vs(grid, T=250.0, direction="0to1")
    s10 = make_vs(grid, T=250.0, direction="1to0")
    w01 = sum(s.w_shift.sum() for s in s01)
    w10 = sum(s.w_shift.sum() for s in s10) if s10 else 0.0
    assert w10 < w01 * 1e-3
    # anti-Stokes shifts are blueward (negative source offsets)
    assert all(s.i_shift.max() < 0 for s in s10)


# --- concatenated-band (_plus) modes -----------------------------------------

def test_rrs_plus_equals_per_band_runs():
    """RRS_plus on a concatenated two-band axis == two independent
    single-band RRS runs (coupling never crosses band boundaries).
    ref: raman_atmo_prop.jl getRamanSSProp!(RRS_plus):75-117."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    from vsmartmom.inelastic.plus import make_rrs_plus

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    g1 = np.arange(12740.0, 13180.0, 8.0)
    g2 = np.arange(14300.0, 14740.0, 8.0)
    cb = make_rrs_plus([g1, g2], T=250.0, j_max=16)
    n_tot = cb.n_spec
    assert cb.band_spec_lim == [(0, len(g1)), (len(g1), n_tot)]

    rng = np.random.default_rng(3)
    tau_rayl = np.full((2, n_tot), 0.12)
    tau_abs = rng.uniform(0.0, 0.3, (2, n_tot))
    tau = tau_rayl + tau_abs
    f_rayl = tau_rayl / tau

    def band_inputs(sl, cab):
        return BandRTInputs(
            tau=tau[:, sl], omega=tau_rayl[:, sl] * cab / tau[:, sl],
            zw=np.ones((2, 1, tau[:, sl].shape[1])),
            greeks=[get_greek_rayleigh(cb.depol_rayl)])

    # concatenated run: per-band Cabannes fractions on the joint axis
    omega_j = tau_rayl.copy()
    for (lo, hi), c in zip(cb.band_spec_lim, cb.omega_cabannes):
        omega_j[:, lo:hi] *= c
    band_j = BandRTInputs(tau=tau, omega=omega_j / tau,
                          zw=np.ones((2, 1, n_tot)),
                          greeks=[get_greek_rayleigh(cb.depol_rayl)])
    Rj, _, ieRj, _ = rt_run_band_rrs(pol, quad, band_j, cb.specs, f_rayl,
                                     [15.0], [0.0], 2, surf)

    for (lo, hi), g, spec in zip(cb.band_spec_lim, [g1, g2], cb.specs):
        single = make_rrs(g, T=250.0, j_max=16)
        Rs, _, ieRs, _ = rt_run_band_rrs(
            pol, quad, band_inputs(slice(lo, hi), single.omega_cabannes),
            single, f_rayl[:, lo:hi], [15.0], [0.0], 2, surf)
        np.testing.assert_allclose(Rj[..., lo:hi], Rs, rtol=1e-10)
        np.testing.assert_allclose(ieRj[..., lo:hi], ieRs, rtol=1e-8,
                                   atol=1e-14)


def test_vs_plus_monochromatic_cross_band():
    """VS_0to1_plus: a monochromatic source (band 1) fills the N2/O2
    vibrationally shifted windows (bands 2-3) and nothing else.
    ref: raman_atmo_prop.jl getRamanSSProp!(VS_0to1_plus):119-252."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    from vsmartmom.inelastic.plus import make_vs_plus
    from vsmartmom.inelastic.xsec import (rotational_raman_lines,
                                          vibrational_raman_lines)
    from vsmartmom.inelastic.constants import molecular_constants

    nu_inc = 25000.0                       # 400 nm
    cb = make_vs_plus(nu_inc, T=250.0, direction="0to1", dnu=4.0,
                      margin=4.0, j_max=12)
    assert len(cb.grids) == 3 and len(cb.grids[0]) == 1
    assert 0.94 < cb.omega_cabannes[0] < 0.99
    assert np.all(cb.omega_cabannes[1:] == 1.0)

    # deposit conserves the total line strength
    mols = [molecular_constants("N2", 0.79),
            molecular_constants("O2", 0.21)]
    rot = [rotational_raman_lines(m, nu_inc, 250.0, 12) for m in mols]
    sigma_rayl = sum(v * ln.sigma_rayl_coeff
                     for ln, v in zip(rot, [0.79, 0.21])) * nu_inc**4
    expect = sum(v * np.sum(co * (nu_inc + sh) ** 4)
                 for v, (sh, co, _r) in zip(
                     [0.79, 0.21],
                     [vibrational_raman_lines(m, nu_inc, 250.0, "0to1", 12)
                      for m in mols])) / sigma_rayl
    got = sum(s.w.sum() for s in cb.specs)
    assert got == pytest.approx(expect, rel=1e-10)

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 6, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    n_tot = cb.n_spec
    tau_rayl = np.full((2, n_tot), 0.2)
    band = BandRTInputs(tau=tau_rayl, omega=np.ones_like(tau_rayl),
                        zw=np.ones((2, 1, n_tot)),
                        greeks=[get_greek_rayleigh(cb.depol_rayl)])
    R, _, ieR, _ = rt_run_band_rrs(pol, quad, band,
                                   cb.specs, np.ones_like(tau_rayl),
                                   [0.0], [0.0], 2, surf)
    fill = ieR[0, 0]
    assert fill[cb.i_ref] == 0.0           # no VS into the incident column
    lo2, hi2 = cb.band_spec_lim[1]
    lo3, hi3 = cb.band_spec_lim[2]
    assert fill[lo2:hi2].max() > 0 and fill[lo3:hi3].max() > 0
    # magnitude: vibrational Raman is ~1e-3 of the elastic radiance in sum
    ratio = fill.sum() / R[0, 0, cb.i_ref]
    assert 1e-5 < ratio < 1e-2
    # outputs with zero deposited weight stay exactly zero
    w_all = np.zeros(n_tot)
    for s in cb.specs:
        np.add.at(w_all, s.i_out, s.w)
    np.testing.assert_array_equal(fill[w_all == 0.0], 0.0)


def test_rvrs_plus_adds_rotational_window():
    """RVRS = VS_plus + rotational window around the incident line."""
    from vsmartmom.inelastic.plus import make_rvrs_plus, make_vs_plus
    nu_inc = 25000.0
    cb = make_rvrs_plus(nu_inc, T=250.0, dnu=4.0, margin=4.0, j_max=12,
                        rrs_dnu=2.0)
    vs = make_vs_plus(nu_inc, T=250.0, dnu=4.0, margin=4.0, j_max=12)
    assert len(cb.grids) == len(vs.grids) + 1
    rot_lo, rot_hi = cb.band_spec_lim[-1]
    rot_w = np.zeros(cb.n_spec)
    for s in cb.specs:
        np.add.at(rot_w, s.i_out, s.w)
    # rotational window captures ~(1-cab)/cab of the Rayleigh strength
    cab = cb.omega_cabannes[0]
    assert rot_w[rot_lo:rot_hi].sum() == pytest.approx((1 - cab) / cab,
                                                       rel=2e-2)


def test_apply_lineshape_conserves_line_strength():
    """Doppler deposit onto a hires grid conserves each line's integral
    and peaks at the line positions (ref: apply_lineshape.jl)."""
    from vsmartmom.inelastic.constants import molecular_constants
    from vsmartmom.inelastic.xsec import (apply_lineshape,
                                          rotational_raman_lines)
    mol = molecular_constants("N2", 0.79)
    ln = rotational_raman_lines(mol, 13000.0, 250.0, 20)
    grid = np.arange(-250.0, 250.0, 0.002)
    sig = apply_lineshape(ln.shifts, ln.coeffs, 13000.0, grid, 250.0, 28.0)
    keep = (ln.shifts > grid.min()) & (ln.shifts < grid.max())
    expect = np.sum(ln.coeffs[keep] * (13000.0 + ln.shifts[keep]) ** 4)
    got = np.trapezoid(sig, grid)
    assert got == pytest.approx(expect, rel=2e-3)
    i = np.argmax(sig)
    j = np.argmax(ln.coeffs * (13000.0 + ln.shifts) ** 4)
    assert abs(grid[i] - ln.shifts[j]) < 0.01
