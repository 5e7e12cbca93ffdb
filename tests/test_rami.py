"""RAMI4ATM scene-runner gates.

Uses the public RAMI4ATM ancillaries (AFGL profile, aerosol refractive
tables, Sentinel-2A ILS) if a data dir provides them; physics gates that
need no data files run unconditionally.
ref: test/rami/rami.jl + rami_tools.jl.
"""
import os

import numpy as np
import pytest

from vsmartmom.core.rami import (AEROSOL_MODES, build_rami_parameters,
                                 convolve_ils, profile_inputs_from_afgl,
                                 rami_geometry, read_afgl_profile,
                                 read_refractive_table, refractive_at,
                                 run_rami_scenario)

DATA_DIR = os.environ.get("VSMARTMOM_RAMI_DIR", "/root/reference/test/rami")
HAS_DATA = os.path.exists(
    os.path.join(DATA_DIR, "RAMI4ATM_AFGLUSstandard_ap_v1.0.txt"))
needs_data = pytest.mark.skipif(not HAS_DATA,
                                reason="RAMI ancillary data not present")


def _scenario(atm_type="AtmosphereType.RAYLEIGH", surface=None,
              aerosols=(), conc=None, band="2", sza=30.0):
    return {
        "name": "HOM00_TEST",
        "measures": [{"bands": [band]}],
        "atmosphere": {"atmosphere_type": atm_type,
                       "aerosols": list(aerosols),
                       "concentrations": conc or {}},
        "illumination": {"sza": {"value": sza}},
        "surface": surface or {"name": "LAM",
                               "surface_parameters": {"reflectance": [0.25]}},
    }


def test_rami_geometry_fan():
    vza, vaz = rami_geometry()
    assert len(vza) == len(vaz) == 4 * 38
    assert set(np.unique(vaz)) == {-90.0, 0.0, 90.0, 180.0}
    assert vza.min() == 1.0 and vza.max() == 75.0


def test_ils_convolution_flat_spectrum():
    """A flat spectrum convolves to itself for any response shape."""
    nu = np.linspace(18000.0, 22000.0, 200)
    wl = np.linspace(400.0, 600.0, 100)
    resp = np.exp(-0.5 * ((wl - 490) / 20.0) ** 2)
    out = convolve_ils(nu, np.full((3, 200), 0.7), wl, resp)
    np.testing.assert_allclose(out, 0.7, rtol=1e-12)


@needs_data
def test_afgl_profile_parse():
    prof = read_afgl_profile(
        os.path.join(DATA_DIR, "RAMI4ATM_AFGLUSstandard_ap_v1.0.txt"))
    assert prof.p_hpa[0] == pytest.approx(1013.0, rel=1e-3)
    assert prof.T[0] == pytest.approx(288.2)
    # US-standard columns: ~330 ppm CO2, ~20.9% O2
    assert prof.vmr["CO2"][0] == pytest.approx(330e-6, rel=1e-6)
    assert prof.vmr["O2"][0] == pytest.approx(0.209, rel=1e-2)
    T, p_half, q, vmr = profile_inputs_from_afgl(prof)
    assert p_half[0] < p_half[-1] and len(T) == len(p_half) - 1
    assert 0 < q[-1] < 10.0        # surface specific humidity in g/kg


@needs_data
def test_refractive_tables():
    for kind in ("desert", "continental"):
        tab = read_refractive_table(
            os.path.join(DATA_DIR, f"refractive_aero_{kind}.txt"))
        n_r, n_i = refractive_at(tab, 550.0)
        assert 1.3 < n_r < 1.6 and 0.0 <= n_i < 0.05


@needs_data
def test_rami_rayleigh_lambertian_scene():
    """Pure-Rayleigh RAMI scene: BHR == surface albedo, BRF sane and
    cross-plane symmetric (vaz +/-90)."""
    sc = _scenario()
    out = run_rami_scenario(sc, DATA_DIR, dnu=60.0, n_layers=8, l_trunc=12,
                            max_m=3)
    assert np.all(np.isfinite(out["brf"]))
    np.testing.assert_allclose(out["bhr"], 0.25, rtol=1e-2)
    n = len(out["vza"]) // 4
    np.testing.assert_allclose(out["brf"][2 * n:3 * n][::-1],
                               out["brf"][3 * n:], rtol=1e-8)
    assert 0.2 < np.median(out["brf"]) < 0.6


@needs_data
def test_rami_rpv_and_rossli_surfaces():
    for surf in ({"name": "RPV", "surface_parameters":
                  {"rho_0": [0.05], "rho_c": [0.05], "k": [0.7],
                   "theta": [-0.1]}},
                 {"name": "RLI", "surface_parameters":
                  {"f_vol": [0.2], "f_geo": [0.05], "f_iso": [0.1]}}):
        sc = _scenario(surface=surf)
        out = run_rami_scenario(sc, DATA_DIR, dnu=60.0, n_layers=6,
                                l_trunc=12, max_m=3)
        assert np.all(np.isfinite(out["brf"])) and out["brf"].max() > 0
        # anisotropic surface: principal-plane BRF fore/aft asymmetry
        n = len(out["vza"]) // 4
        assert not np.allclose(out["brf"][:n][::-1], out["brf"][n:2 * n],
                               rtol=1e-3)


@needs_data
def test_rami_aerosol_scene():
    """SCATTERING_AEROSOLS: bimodal desert aerosol over a dark surface
    raises TOA BRF vs the aerosol-free Rayleigh-only case."""
    dark = {"name": "BLA", "surface_parameters": {"reflectance": [0.0]}}
    aero = [{"name": "DESERT", "tau_550": 0.2}]
    out_a = run_rami_scenario(
        _scenario("AtmosphereType.AEROSOLS", surface=dark, aerosols=aero),
        DATA_DIR, dnu=60.0, n_layers=6, l_trunc=12, max_m=3,
        nquad_radius=60)
    out_r = run_rami_scenario(
        _scenario("AtmosphereType.RAYLEIGH", surface=dark),
        DATA_DIR, dnu=60.0, n_layers=6, l_trunc=12, max_m=3)
    assert np.median(out_a["brf"]) > 0.001
    assert np.all(np.isfinite(out_a["brf"]))
    # Rayleigh-off scenes carry no molecular scattering signal
    p = build_rami_parameters(
        _scenario("AtmosphereType.AEROSOLS", surface=dark, aerosols=aero),
        DATA_DIR, dnu=60.0)
    assert p.absorption_params is None


@needs_data
def test_rami_gas_scaling():
    """Concentration scaling hits each gas with its own ratio."""
    from vsmartmom.core.atmosphere import compute_atmos_profile_fields
    from vsmartmom.core.rami import h2o_column_kg_m2, o3_column_kg_m2
    conc = {"H2O": {"value": 7.0}, "O3": {"value": 0.01}}
    p = build_rami_parameters(_scenario("AtmosphereType.ABSORBING",
                                        conc=conc, band="2"),
                              DATA_DIR, dnu=60.0)
    prof = compute_atmos_profile_fields(
        p.T, p.p, p.q, p.absorption_params.vmr)
    assert h2o_column_kg_m2(prof) == pytest.approx(7.0, rel=2e-2)
    assert o3_column_kg_m2(prof) == pytest.approx(0.01, rel=1e-3)
