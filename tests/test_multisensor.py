"""Multi-sensor RT gates.

Consistency anchors: a sensor at TOA must reproduce rt_run_band's R_SFI and
a sensor at BOA must reproduce its T_SFI (same interlayer coupling algebra,
ref: rt_run_multisensor.jl vs rt_run.jl).
"""
import numpy as np
import pytest

from vsmartmom.core.multisensor import rt_run_band_ms
from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams

VZA = [0.0, 30.0, 60.0]
VAZ = [0.0, 90.0, 180.0]
SURF = {"type": "LambertianSurfaceScalar", "albedo": 0.15}


def _setup(pol_name="Stokes_IQU", n_z=4, n_spec=3):
    pol = Polarization.from_name(pol_name)
    quad = rt_set_streams("GaussQuadFullSphere", 12, 45.0, VZA, pol.n)
    rng = np.random.default_rng(3)
    tau_scat = np.full((n_z, n_spec), 0.08)
    tau_abs = rng.uniform(0.0, 0.3, (n_z, n_spec))
    tau = tau_scat + tau_abs
    band = BandRTInputs(tau=tau, omega=tau_scat / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.0)])
    return pol, quad, band


def test_toa_boa_match_single_sensor_run():
    pol, quad, band = _setup()
    n_z = band.tau.shape[0]
    R, T = rt_run_band(pol, quad, band, VZA, VAZ, 3, SURF)
    uw, dw = rt_run_band_ms(pol, quad, band, VZA, VAZ, 3, SURF, [0, n_z])
    np.testing.assert_allclose(uw[0], R, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(dw[1], T, rtol=1e-10, atol=1e-14)


def test_interior_sensor_physical():
    pol, quad, band = _setup(pol_name="Stokes_I")
    n_z = band.tau.shape[0]
    levels = [0, 2, n_z]
    uw, dw = rt_run_band_ms(pol, quad, band, VZA, VAZ, 3, SURF, levels)
    assert np.all(np.isfinite(uw)) and np.all(np.isfinite(dw))
    # downwelling diffuse grows toward the surface in a scattering atmosphere
    assert np.all(dw[1, :, 0, :] >= dw[0, :, 0, :] - 1e-12)
    # upwelling I stays positive everywhere
    assert np.all(uw[:, :, 0, :] > 0)


def test_unsorted_and_duplicate_levels():
    pol, quad, band = _setup(pol_name="Stokes_I", n_z=3)
    uw1, dw1 = rt_run_band_ms(pol, quad, band, VZA, VAZ, 2, SURF, [3, 0, 1])
    uw2, dw2 = rt_run_band_ms(pol, quad, band, VZA, VAZ, 2, SURF, [0, 1, 3])
    np.testing.assert_allclose(uw1[1], uw2[0], rtol=1e-12)
    np.testing.assert_allclose(uw1[2], uw2[1], rtol=1e-12)
    np.testing.assert_allclose(uw1[0], uw2[2], rtol=1e-12)


def test_ms_brdf_surface():
    pol, quad, band = _setup(pol_name="Stokes_I", n_z=3)
    uw, dw = rt_run_band_ms(pol, quad, band, VZA, VAZ, 2,
                            {"type": "rpvSurfaceScalar", "rho0": 0.2,
                             "rho_c": 0.6, "k": 0.8, "theta": -0.1},
                            [0, 3])
    assert np.all(np.isfinite(uw)) and np.all(np.isfinite(dw))
    assert np.all(uw[:, :, 0, :] > 0)
