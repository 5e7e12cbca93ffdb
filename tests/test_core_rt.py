"""CoreRT accuracy gates: 6SV1 scalar Rayleigh + Natraj polarized tables.

Mirrors the reference's canonical correctness tests
(ref: /root/reference/test/test_CoreRT.jl) with identical configurations and
tolerances: single Rayleigh layer, RadauQuad streams, Stokes IQUV, max_m = 3,
l_trunc = 20, depol = 0.
"""
import json
import os

import numpy as np
import pytest

from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams

DATA = os.path.join(os.path.dirname(__file__), "data")

VZA_16 = [0.0, 11.4783, 16.2602, 23.0739, 32.8599, 43.9455, 50.2082, 58.6677,
          66.4218, 71.3371, 73.7398, 78.463, 80.7931, 84.2608, 86.5602,
          88.854]

POL = Polarization.from_name("Stokes_IQUV")
GREEK_RAYL = get_greek_rayleigh(0.0)


def _run_rayleigh(sza, vaz_scalar, tau, albedo):
    quad = rt_set_streams("RadauQuad", 20, sza, VZA_16, POL.n)
    band = BandRTInputs(tau=np.full((1, 2), tau), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)), greeks=[GREEK_RAYL])
    R, _ = rt_run_band(POL, quad, band, VZA_16, [vaz_scalar] * 16, 3,
                       {"type": "LambertianSurfaceScalar", "albedo": albedo})
    return R, quad


CASES_6SV1 = [
    (1, [180, 90, 0], [23.0739, 53.1301, 78.4630], 0.1, 0.0),
    (2, [180, 90, 0], [0.0001, 36.8699, 66.4218], 0.1, 0.25),
    (3, [180, 90, 0], [0.0001, 36.8699, 66.4218], 0.25, 0.0),
    (4, [180, 90, 0], [23.0739, 53.1301, 78.4630], 0.25, 0.25),
    (5, [180, 90, 0], [23.0739, 53.1301, 78.4630], 0.50, 0.0),
    (6, [180, 90, 0], [0.0001, 36.8699, 66.4218], 0.50, 0.25),
]


@pytest.mark.parametrize("case", CASES_6SV1, ids=lambda c: f"case{c[0]}")
def test_against_6sv1(case):
    """Scalar Rayleigh reflectance vs 6SV1 (ref: test_CoreRT.jl:3-38)."""
    r_trues = np.asarray(json.load(open(f"{DATA}/6sv1_r_trues.json")))
    ci, azs, szas, tau, rho = case
    worst = 0.0
    for sza_i, sza in enumerate(szas):
        for az_i, az in enumerate(azs):
            R, quad = _run_rayleigh(sza, az, tau, rho)
            r_model = R[:, 0, 0] / quad.mu0
            r_true = r_trues[ci - 1, sza_i, az_i]
            worst = max(worst, np.max(np.abs(r_true - r_model) / r_true))
    assert worst < 0.006, worst


def test_against_natraj():
    """Polarized I/Q/U vs Natraj et al. tables (ref: test_CoreRT.jl:40-83)."""
    d = np.load(f"{DATA}/natraj_trues.npz")
    I_t, Q_t, U_t = d["I_trues"], d["Q_trues"], d["U_trues"]
    mu = np.array([0.02, 0.06, 0.10, 0.16, 0.20, 0.28, 0.32, 0.40, 0.52,
                   0.64, 0.72, 0.84, 0.92, 0.96, 0.98, 1.00])
    phis = np.arange(0.0, 181.0, 30.0)
    vza = np.degrees(np.arccos(mu))
    sza = np.degrees(np.arccos(0.2))

    quad = rt_set_streams("RadauQuad", 20, sza, vza, POL.n)
    band = BandRTInputs(tau=np.full((1, 2), 0.5), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)), greeks=[GREEK_RAYL])
    I_m = np.zeros((16, 7))
    Q_m = np.zeros((16, 7))
    U_m = np.zeros((16, 7))
    for j, phi in enumerate(phis):
        R, _ = rt_run_band(POL, quad, band, vza, [phi] * 16, 3,
                           {"type": "LambertianSurfaceScalar", "albedo": 0.0})
        I_m[:, j], Q_m[:, j], U_m[:, j] = R[:, 0, 0], R[:, 1, 0], R[:, 2, 0]

    i_err = np.max(np.abs(I_t - I_m) / I_t)
    assert i_err < 0.002, i_err
    # Reference masks on signed modeled values >= 0.01 (test_CoreRT.jl:80-81)
    q_mask = Q_m >= 0.01
    q_err = np.max(np.abs(Q_t - Q_m)[q_mask] / np.abs(Q_t)[q_mask])
    assert q_err < 0.008, q_err
    u_mask = U_m >= 0.01
    with np.errstate(invalid="ignore"):
        u_rel = np.abs(U_t - U_m)[u_mask] / np.abs(U_t)[u_mask]
    u_err = np.nanmax(u_rel)
    assert u_err < 0.008, u_err
    # Stricter supplemental check: absolute agreement everywhere
    assert np.max(np.abs(Q_t - Q_m)) < 6e-4
    assert np.max(np.abs(U_t - U_m)) < 6e-4


def test_hdr_bhr_outputs():
    """Hemispheric outputs (RAMI): for a Lambertian surface the
    bi-hemispheric ratio equals the albedo (up to the hemispheric-quadrature
    approximation of the half-range integral), independent of tau; at
    tau -> 0 the surface-leaving hdr equals the TOA radiance."""
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 12, 45.0, [0.0, 30.0],
                          pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.25}
    for tau, hdr_is_toa in ((1e-7, True), (0.3, False)):
        band = BandRTInputs(tau=np.full((1, 2), tau),
                            omega=np.ones((1, 2)), zw=np.ones((1, 1, 2)),
                            greeks=[get_greek_rayleigh(0.0)])
        R, T, hdr, bhr_uw, bhr_dw = rt_run_band(
            pol, quad, band, [0.0, 30.0], [0.0, 0.0], 3, surf,
            return_hdr=True)
        np.testing.assert_allclose(bhr_uw / bhr_dw, 0.25, rtol=0.01)
        if hdr_is_toa:
            np.testing.assert_allclose(hdr, R, rtol=1e-6)
        else:
            assert np.all(hdr[:, 0, :] < R[:, 0, :])  # atmosphere adds path radiance

    # black surface: no surface-leaving radiance
    band = BandRTInputs(tau=np.full((1, 2), 0.3), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)),
                        greeks=[get_greek_rayleigh(0.0)])
    _, _, hdr0, bhr_uw0, _ = rt_run_band(
        pol, quad, band, [0.0, 30.0], [0.0, 0.0], 3,
        {"type": "LambertianSurfaceScalar", "albedo": 0.0}, return_hdr=True)
    assert np.max(np.abs(hdr0)) < 1e-14 and np.max(np.abs(bhr_uw0)) < 1e-14


def test_non_sfi_postprocessing():
    """Non-SFI synthesis (radiances from R-+/T++ operator columns at the
    mu0 node, ref: postprocessing_vza.jl:30-56 SFI=false branch) agrees
    with the SFI path when the beam is a real quadrature node (RadauQuad):
    the discrete field then resolves the beam and the two syntheses
    differ only by quadrature truncation."""
    sza, tau = 30.0, 0.5
    quad = rt_set_streams("RadauQuad", 20, sza, VZA_16, POL.n)
    band = BandRTInputs(tau=np.full((1, 2), tau), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)), greeks=[GREEK_RAYL])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.0}
    R_sfi, _ = rt_run_band(POL, quad, band, VZA_16, [90.0] * 16, 3, surf)
    R_ns, T_ns = rt_run_band(POL, quad, band, VZA_16, [90.0] * 16, 3, surf,
                             sfi=False)
    # same physics, different beam treatment: agreement at the quadrature-
    # truncation level on I (ref runs its accuracy gates with SFI=true)
    rel = np.abs(R_ns[:, 0, 0] - R_sfi[:, 0, 0]) / R_sfi[:, 0, 0]
    assert np.max(rel) < 0.02, np.max(rel)
    assert np.isfinite(T_ns).all()

    # with a reflecting surface both syntheses must track the albedo jump
    surf2 = {"type": "LambertianSurfaceScalar", "albedo": 0.25}
    R_sfi2, _ = rt_run_band(POL, quad, band, VZA_16, [90.0] * 16, 3, surf2)
    R_ns2, _ = rt_run_band(POL, quad, band, VZA_16, [90.0] * 16, 3, surf2,
                           sfi=False)
    jump_sfi = R_sfi2[:, 0, 0] - R_sfi[:, 0, 0]
    jump_ns = R_ns2[:, 0, 0] - R_ns[:, 0, 0]
    assert np.max(np.abs(jump_ns - jump_sfi) / jump_sfi) < 0.05
