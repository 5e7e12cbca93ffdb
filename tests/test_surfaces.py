"""BRDF surface gates: RPV / Ross-Li / Legendre-Lambertian.

Degenerate-parameter checks: each BRDF collapses analytically to a
Lambertian for specific parameters, so the full RT stack must reproduce the
Lambertian result through the generic BRDF Fourier path.
"""
import numpy as np
import pytest

from vsmartmom.core.brdf import (brdf_fourier_matrix,
                                 legendre_spectral_albedo,
                                 rossli_reflectance, rpv_reflectance)
from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams

VZA = [0.0, 30.0, 60.0]
VAZ = [0.0, 90.0, 180.0]


def _run(surface, pol_name="Stokes_I", tau=0.2):
    pol = Polarization.from_name(pol_name)
    quad = rt_set_streams("GaussQuadFullSphere", 12, 45.0, VZA, pol.n)
    band = BandRTInputs(tau=np.full((1, 2), tau), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)),
                        greeks=[get_greek_rayleigh(0.0)])
    return rt_run_band(pol, quad, band, VZA, VAZ, 3, surface)


def test_rpv_lambertian_limit():
    """k=1, theta=0, rho_c=1 -> f == rho0 (constant) == Lambertian."""
    r_rpv, _ = _run({"type": "rpvSurfaceScalar", "rho0": 0.2, "rho_c": 1.0,
                     "k": 1.0, "theta": 0.0})
    r_lam, _ = _run({"type": "LambertianSurfaceScalar", "albedo": 0.2})
    np.testing.assert_allclose(r_rpv, r_lam, rtol=1e-6, atol=1e-9)


def test_rossli_lambertian_limit():
    """fvol = fgeo = 0 -> f == fiso == Lambertian."""
    r_rl, _ = _run({"type": "RossLiSurfaceScalar", "fiso": 0.3,
                    "fvol": 0.0, "fgeo": 0.0})
    r_lam, _ = _run({"type": "LambertianSurfaceScalar", "albedo": 0.3})
    np.testing.assert_allclose(r_rl, r_lam, rtol=1e-6, atol=1e-9)


def test_legendre_constant_limit():
    """Single Legendre coefficient == scalar albedo."""
    r_leg, _ = _run({"type": "LambertianSurfaceLegendre",
                     "legendre_coeff": [0.25]})
    r_lam, _ = _run({"type": "LambertianSurfaceScalar", "albedo": 0.25})
    np.testing.assert_allclose(r_leg, r_lam, rtol=1e-8)


def test_legendre_spectral_albedo_values():
    a = legendre_spectral_albedo([0.1, 0.05, 0.02], 5)
    x = np.linspace(-1, 1, 5)
    expect = 0.1 + 0.05 * x + 0.02 * 0.5 * (3 * x**2 - 1)
    np.testing.assert_allclose(a, expect, rtol=1e-12)


def test_brdf_reciprocity():
    """RPV and Ross-Li kernels are reciprocal: f(mu_i, mu_r) = f(mu_r, mu_i),
    so every Fourier matrix must be symmetric (intensity block)."""
    mu = np.array([0.3, 0.55, 0.8, 1.0])
    for m in range(3):
        r1 = brdf_fourier_matrix({"type": "rpvSurfaceScalar", "rho0": 0.1,
                                  "rho_c": 0.6, "k": 0.7, "theta": -0.1},
                                 mu, m, 1)
        r2 = brdf_fourier_matrix({"type": "RossLiSurfaceScalar",
                                  "fiso": 0.2, "fvol": 0.05, "fgeo": 0.03},
                                 mu, m, 1)
        np.testing.assert_allclose(r1, r1.T, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(r2, r2.T, rtol=1e-10, atol=1e-14)


def test_rpv_hotspot_enhancement():
    """The RPV hotspot factor (rho_c < 1) brightens the retro direction."""
    f_hot = rpv_reflectance(0.7, 0.7, np.pi, 0.1, 0.2, 0.8, -0.1)
    f_no = rpv_reflectance(0.7, 0.7, np.pi, 0.1, 1.0, 0.8, -0.1)
    assert f_hot > f_no


def test_rpv_anisotropy_changes_viewing_pattern():
    """A bowl-shaped RPV (k < 1) must differ from Lambertian at off-nadir."""
    r_rpv, _ = _run({"type": "rpvSurfaceScalar", "rho0": 0.2, "rho_c": 1.0,
                     "k": 0.6, "theta": -0.2})
    r_lam, _ = _run({"type": "LambertianSurfaceScalar", "albedo": 0.2})
    assert np.max(np.abs(r_rpv[:, 0, 0] - r_lam[:, 0, 0])
                  / r_lam[:, 0, 0]) > 0.01


def test_rossli_finite_polarized():
    """Ross-Li under IQU stays finite and U=0 in the principal plane."""
    R, _ = _run({"type": "RossLiSurfaceScalar", "fiso": 0.2, "fvol": 0.05,
                 "fgeo": 0.02}, pol_name="Stokes_IQU")
    assert np.all(np.isfinite(R))
    assert abs(R[0, 2, 0]) < 1e-10
