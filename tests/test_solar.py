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


def test_default_solar_transmission_offline_fallback():
    grid = np.arange(13000.0, 13001.0, 0.1)
    with pytest.warns(UserWarning):
        out = default_solar_transmission(grid)
    assert out.shape == (len(grid), 2)
    np.testing.assert_allclose(out[:, 1], 1.0)
