"""Planck-spectrum gates (peak positions/values vs Wien-law truths).

ref: test/test_SolarModel.jl:1-29 (same truth table and tolerances).
"""
import numpy as np
import pytest

from vsmartmom.solar import (default_solar_transmission, planck_spectrum_wl,
                             planck_spectrum_wn, watts_to_photons)

CASES = [  # (T, peak_nu, peak_wl_um, peak_L_nu, peak_L_wl)
    (290, 568.693, 9.99225, 138.636, 8.40098),
    (1000, 1961.01, 2.89775, 5684.38, 4095.81),
    (3777, 7406.74, 0.76721, 306284.0, 3.14829e6),
]


@pytest.mark.parametrize("T,peak_nu,peak_wl,peak_L_nu,peak_L_wl", CASES)
def test_planck_peaks(T, peak_nu, peak_wl, peak_L_nu, peak_L_wl):
    spec = planck_spectrum_wn(T)
    i = np.argmax(spec[:, 1])
    assert spec[i, 1] == pytest.approx(peak_L_nu, rel=1e-4, abs=1)
    assert spec[i, 0] == pytest.approx(peak_nu, rel=1e-4, abs=1)
    assert planck_spectrum_wl(T, [peak_wl])[0] == pytest.approx(
        peak_L_wl, rel=1e-4, abs=1)


def test_planck_wn_wl_consistency():
    # L_nu dnu = L_wl dwl: L_wl = L_nu * nu^2 / 1e4 (wl in um, nu in cm-1),
    # with mW->W factor 1e-3.
    nu = np.array([5000.0, 12000.0])
    wl = 1e4 / nu
    l_nu = planck_spectrum_wn(5777.0, nu)           # mW/m2-sr-cm-1
    l_wl = planck_spectrum_wl(5777.0, wl)           # W/m2-sr-um
    np.testing.assert_allclose(l_wl, l_nu * 1e-3 * nu**2 / 1e4, rtol=1e-12)


def test_watts_to_photons():
    # 1 W at 1 um -> 1 / (hc/lambda) photons
    out = watts_to_photons([1.0], [1.0])
    assert out[0] == pytest.approx(5.0341e18, rel=1e-3)


def test_default_solar_transmission_offline_fallback(tmp_path, monkeypatch):
    # hide the vendored line list (search paths are cwd-relative)
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("VSMARTMOM_SOLAR_FILE", raising=False)
    monkeypatch.delenv("VSMARTMOM_DATA_DIR", raising=False)
    grid = np.arange(13000.0, 13001.0, 0.1)
    with pytest.warns(UserWarning):
        out = default_solar_transmission(grid)
    assert out.shape == (len(grid), 2)
    np.testing.assert_allclose(out[:, 1], 1.0)


# Known vacuum wavenumbers of classical Fraunhofer lines [cm^-1]
# (air wavelengths from Allen's AQ converted with Edlen standard air;
#  e.g. Na D2 5889.95 A air = 5891.58 A vac = 16973.37 cm^-1).
FRAUNHOFER = [
    ("Ca II K", 25414.42, 0.5),
    ("H-alpha", 15233.17, 0.3),
    ("Na D2", 16973.37, 0.3),
    ("Na D1", 16956.18, 0.3),
    ("K I", 12985.19, 0.1),
]


@pytest.mark.parametrize("name,nu0,min_depth", FRAUNHOFER)
def test_solar_linelist_fraunhofer_lines(name, nu0, min_depth):
    """The vendored solar transmission has absorption minima at the known
    Fraunhofer positions (ref: SolarModel.jl:96-157 behavior with the Toon
    GGG2014 list; here the physics-derived stand-in from
    tools/make_solar_linelist.py)."""
    grid = np.arange(nu0 - 5.0, nu0 + 5.0, 0.01)
    out = default_solar_transmission(grid)
    trans = out[:, 1]
    i_min = int(np.argmin(trans))
    # saturated cores have flat bottoms: locate by absorption centroid
    depth = 1.0 - trans
    centroid = float((grid * depth).sum() / depth.sum())
    assert abs(centroid - nu0) < 0.5, (name, centroid)
    assert trans[i_min] < 1.0 - min_depth, (name, trans[i_min])
    # continuum recovers away from the core
    assert trans[0] > trans[i_min] and trans[-1] > trans[i_min]


def test_solar_na_d_equivalent_width():
    """EW of the Na D2 profile matches the published 0.75 A within the
    synthesis tolerance (integral check over +-40 cm^-1)."""
    nu0 = 16973.37
    grid = np.arange(nu0 - 40.0, nu0 + 20.0, 0.005)   # D1 sits +17 cm^-1
    # isolate D2: integrate only its half-profiles away from D1
    out = default_solar_transmission(grid)
    depth = 1.0 - out[:, 1]
    mask = np.abs(grid - nu0) < 8.0
    ew_wn = np.trapezoid(depth[mask], grid[mask])
    ew_angstrom = ew_wn / (nu0**2 * 1e-8)
    assert 0.4 < ew_angstrom < 1.1, ew_angstrom


def test_solar_spectrum_at_earth_has_lines():
    from vsmartmom.solar import default_solar_spectrum_at_earth
    grid = np.arange(16950.0, 16990.0, 0.01)
    spec = default_solar_spectrum_at_earth(grid)
    # both Na D lines carved into the Planck envelope
    smooth = np.interp(grid, grid[::200], spec[::200, 1])
    dips = (smooth - spec[:, 1]) / smooth
    assert (dips > 0.5).sum() > 10
