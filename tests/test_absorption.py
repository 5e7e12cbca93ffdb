"""Spectroscopy tests: HITRAN parsing, CEFs, Voigt cross-sections, LUT, AD.

Mirrors the reference's test strategy (test_Absorption.jl). The HAPI-CSV
gate requires the full CO2 line list (network artifact, unavailable
air-gapped); instead the Voigt pipeline is gated against an independent
straight-line reimplementation using scipy's exact Faddeeva wofz and the
same HITRAN physics — a strictly tighter check at the same 3.6e-27
tolerance.
"""
import os

import numpy as np
import pytest
from scipy.special import wofz

from vsmartmom.spectroscopy.hitran import HitranEmptyError, read_hitran
from vsmartmom.spectroscopy import tips
from vsmartmom.spectroscopy.lut import (load_interpolation_model,
                                        make_interpolation_model,
                                        save_interpolation_model)
from vsmartmom.spectroscopy.voigt import (absorption_cross_section,
                                          compute_absorption_cross_section,
                                          make_hitran_model)

DATA = os.path.join(os.path.dirname(__file__), "data")
CO2_FILE = os.path.join(DATA, "testCO2.par")


def test_read_hitran_fixture():
    """Exact field values from the CO2 fixture (ref: test_Absorption.jl:2-71)."""
    ht = read_hitran(CO2_FILE, mol=2, iso=1, nu_min=6000, nu_max=6400)
    assert list(ht.mol) == [2, 2, 2, 2]
    assert list(ht.iso) == [1, 1, 1, 1]
    np.testing.assert_array_equal(
        ht.nu, [6000.542970, 6286.403343, 6317.417493, 6380.824116])
    np.testing.assert_array_equal(
        ht.sw, [1.098e-28, 9.843e-30, 5.613e-27, 1.809e-30])
    np.testing.assert_array_equal(
        ht.a, [9.993e-08, 1.179e-08, 1.324e-05, 1.601e-02])
    np.testing.assert_array_equal(ht.gamma_air, [.0880, .0687, .0682, .0671])
    np.testing.assert_array_equal(ht.gamma_self, [0.118, 0.087, 0.081, 0.073])
    np.testing.assert_array_equal(
        ht.elower, [7.8043, 464.1717, 639.6004, 3798.2095])
    np.testing.assert_array_equal(ht.n_air, [0.77, 0.76, 0.76, 0.73])
    np.testing.assert_array_equal(
        ht.delta_air, [-.004342, -.007362, -.007443, -.007669])
    assert ht.global_upper_quanta == ["       4 1 1 03", "       2 2 2 12",
                                      "       2 2 2 12", "       4 2 2 12"]
    assert ht.local_lower_quanta == ["     Q  4e     ", "     Q 34e     ",
                                     "     R 40e     ", "     R 51f     "]
    assert ht.ierr == ["367774", "367764", "367764", "367774"]
    assert ht.iref == ["2029 5 4 5 7"] * 4
    np.testing.assert_array_equal(ht.gp, [9.0, 69.0, 83.0, 105.0])
    np.testing.assert_array_equal(ht.gpp, [9.0, 69.0, 81.0, 103.0])

    # optional-filter behaviors
    assert list(read_hitran(CO2_FILE, iso=1, nu_min=6000, nu_max=6400).mol) \
        == [1, 2, 2, 2, 2]
    assert list(read_hitran(CO2_FILE, mol=2, nu_min=6000, nu_max=6400).iso) \
        == [2, 1, 1, 1, 1]
    assert len(read_hitran(CO2_FILE, mol=2, iso=1, nu_max=6400).mol) == 9
    assert len(read_hitran(CO2_FILE, mol=2, iso=1, nu_min=6000).mol) == 7
    assert len(read_hitran(CO2_FILE, mol=2, iso=1).mol) == 12
    with pytest.raises(HitranEmptyError):
        read_hitran(CO2_FILE, mol=99)


def test_read_hitran_native_matches_python():
    """The C++ scanner (vsmartmom/native) is field-exact vs the pure-Python
    parser on every record and under every filter combination."""
    for kw in [dict(), dict(mol=2), dict(mol=2, iso=1),
               dict(nu_min=6000, nu_max=6400),
               dict(mol=2, iso=1, nu_min=6000, nu_max=6400),
               dict(min_strength=1e-28)]:
        py = read_hitran(CO2_FILE, engine="python", **kw)
        nat = read_hitran(CO2_FILE, engine="native", **kw)
        for f in ("mol", "iso", "nu", "sw", "a", "gamma_air", "gamma_self",
                  "elower", "n_air", "delta_air", "gp", "gpp"):
            np.testing.assert_array_equal(getattr(nat, f), getattr(py, f), f)
        for f in ("global_upper_quanta", "global_lower_quanta",
                  "local_upper_quanta", "local_lower_quanta", "ierr",
                  "iref", "line_mixing_flag"):
            assert getattr(nat, f) == getattr(py, f), f
    with pytest.raises(HitranEmptyError):
        read_hitran(CO2_FILE, mol=99, engine="native")


def test_tips_partition_sums():
    # Q(296 K)/Q(T) ratios: Q grows with T, so ratio > 1 for T < 296
    r250 = tips.qoft_ratio(2, 1, 250.0)
    r296 = tips.qoft_ratio(2, 1, 296.0)
    r350 = tips.qoft_ratio(2, 1, 350.0)
    assert r250 > 1.0 > r350
    np.testing.assert_allclose(r296, 1.0, atol=1e-12)
    assert tips.mol_weight(2, 1) == pytest.approx(43.98983)
    assert tips.mol_number("CO2") == 2
    assert tips.mol_number("O2") == 7


def _independent_voigt_xsec(ht, grid, p, T, wing_cutoff=40.0, vmr=0.0):
    """Straight-line HITRAN Voigt reimplementation with exact wofz."""
    C2, P_REF, T_REF = 1.4387769, 1013.25, 296.0
    SQRT_2LN2, SQRT_LN2 = 1.1774100225, 0.8325546111577
    C, KB, U = 2.99792458e8, 1.3806503e-23, 1.66053873e-27
    out = np.zeros(len(grid))
    for j in range(len(ht.nu)):
        if not (grid.min() - wing_cutoff < ht.nu[j] < grid.max() + wing_cutoff):
            continue
        nu = ht.nu[j] + p / P_REF * ht.delta_air[j]
        gl = ((ht.gamma_air[j] * (1 - vmr) + ht.gamma_self[j] * vmr)
              * p / P_REF * (T_REF / T) ** ht.n_air[j])
        gd = (SQRT_2LN2 / C) * np.sqrt(KB / U) * np.sqrt(T) * ht.nu[j] \
            / np.sqrt(tips.mol_weight(int(ht.mol[j]), int(ht.iso[j])))
        S = ht.sw[j]
        if ht.elower[j] != -1:
            sp = tips._tq_spline(int(ht.mol[j]), int(ht.iso[j]))
            S = S * float(sp(T_REF) / sp(T)) \
                * np.exp(C2 * ht.elower[j] * (1 / T_REF - 1 / T)) \
                * (1 - np.exp(-C2 * ht.nu[j] / T)) \
                / (1 - np.exp(-C2 * ht.nu[j] / T_REF))
        # wing-cutoff window around the UNSHIFTED center (HAPI / reference
        # convention, compute_absorption_cross_section.jl:106-107)
        mask = np.abs(grid - ht.nu[j]) <= wing_cutoff
        z = SQRT_LN2 / gd * (grid[mask] - nu) + 1j * SQRT_LN2 * gl / gd
        out[mask] += S * 0.469718639319144059835 / gd * np.real(wofz(z))
    return out


@pytest.mark.parametrize("p,T", [(1000.0, 250.0), (250.0, 100.0),
                                 (1250.0, 400.0), (750.0, 296.5)])
def test_voigt_xsec_vs_independent(p, T):
    """Voigt sigma vs independent exact-wofz implementation, at the HAPI
    gate tolerance (3.6e-27 cm^2) and a tighter relative bound."""
    ht = read_hitran(CO2_FILE, mol=2, iso=1)
    model = make_hitran_model(ht, "Voigt")
    grid = np.arange(6000.0, 6400.0, 0.01)
    ours = np.asarray(compute_absorption_cross_section(model, grid, p, T))
    ref = _independent_voigt_xsec(ht, grid, p, T)
    assert np.abs(ours - ref).max() < 3.6e-27
    big = ref > ref.max() * 1e-6
    rel = np.abs(ours - ref)[big] / ref[big]
    assert rel.max() < 2e-5, rel.max()   # CEF approximation accuracy


def test_lorentz_doppler_shapes():
    ht = read_hitran(CO2_FILE, mol=2, iso=1, nu_min=6200, nu_max=6300)
    grid = np.arange(6236.0, 6336.0, 0.01)
    for b in ("Lorentz", "Doppler"):
        model = make_hitran_model(ht, b)
        xs = np.asarray(compute_absorption_cross_section(model, grid, 1000.0,
                                                         250.0))
        assert np.all(xs >= 0) and xs.max() > 0


def test_wavelength_wavenumber_roundtrip():
    """ref: test_Absorption.jl:146-154"""
    ht = read_hitran(CO2_FILE, mol=2, iso=1)
    model = make_hitran_model(ht, "Voigt")
    wn_grid = np.arange(6000.0, 6400.0, 0.01)
    wl_grid = 1e7 / wn_grid[::-1]
    xs_wn = np.asarray(compute_absorption_cross_section(model, wn_grid,
                                                        1000.0, 250.0))
    xs_wl = np.asarray(compute_absorption_cross_section(
        model, wl_grid, 1000.0, 250.0, wavelength_flag=True))
    # wavelength grid maps to a slightly different wavenumber sampling;
    # compare on the resampled grid
    wn_from_wl = np.sort(1e7 / wl_grid)
    xs_wn_resampled = np.asarray(compute_absorption_cross_section(
        model, wn_from_wl, 1000.0, 250.0))
    np.testing.assert_allclose(xs_wl[::-1], xs_wn_resampled, rtol=1e-12)
    assert xs_wn.max() == pytest.approx(xs_wl.max(), rel=1e-3)


def test_interpolation_model_roundtrip(tmp_path):
    """LUT reproduces direct computation (ref: test_Absorption.jl:159-190)."""
    ht = read_hitran(CO2_FILE, mol=2, iso=1)
    model = make_hitran_model(ht, "Voigt")
    nu = np.arange(6300.0, 6340.0, 0.01)
    itp = make_interpolation_model(model, nu, np.arange(800., 1300., 100.),
                                   np.arange(200., 350., 25.))
    path = str(tmp_path / "lut.npz")
    save_interpolation_model(itp, path)
    itp2 = load_interpolation_model(path)
    direct = np.asarray(compute_absorption_cross_section(model, nu, 1000.0,
                                                         250.0))
    interp = itp2(nu, 1000.0, 250.0)
    assert itp2.method == "cubic"
    assert np.abs(direct - interp).max() < 3.6e-27


def test_interpolation_cubic_beats_linear_on_absco_spacing():
    """Cubic B-splines (the reference's scheme, make_model_helpers.jl:91)
    on an ABSCO-like coarse (p, T) grid: off-grid (p, T) queries must meet
    the HAPI tolerance, where trilinear does not."""
    ht = read_hitran(CO2_FILE, mol=2, iso=1)
    model = make_hitran_model(ht, "Voigt")
    nu = np.arange(6300.0, 6320.0, 0.01)
    # ABSCO v5 layering: ~100 hPa pressure spacing, ~25 K temperature rungs
    p_grid = np.arange(200.0, 1301.0, 100.0)
    t_grid = np.arange(150.0, 351.0, 25.0)
    kw = dict(nu_grid=nu, p_grid=p_grid, t_grid=t_grid)
    cubic = make_interpolation_model(model, method="cubic", **kw)
    linear = make_interpolation_model(model, method="linear", **kw)

    worst_c = worst_l = 0.0
    for p, t in [(957.0, 261.5), (463.0, 212.3), (1142.0, 288.7)]:
        direct = np.asarray(compute_absorption_cross_section(model, nu, p, t))
        worst_c = max(worst_c, np.abs(cubic(nu, p, t) - direct).max())
        worst_l = max(worst_l, np.abs(linear(nu, p, t) - direct).max())
    assert worst_c < 3.6e-27, worst_c
    assert worst_c < 0.25 * worst_l, (worst_c, worst_l)


def test_xsec_autodiff():
    """Jacobian wrt (p, T) runs and is finite (ref: test_Absorption.jl:194)."""
    ht = read_hitran(CO2_FILE, mol=2, iso=1)
    model = make_hitran_model(ht, "Voigt")
    grid = np.arange(6280.0, 6290.0, 0.01)
    value, jac = absorption_cross_section(model, grid, 1000.0, 250.0,
                                          autodiff=True)
    assert jac.shape == (len(grid), 2)
    assert np.isfinite(np.asarray(jac)).all()
    # finite-difference check on dT
    eps = 0.01
    xp = np.asarray(compute_absorption_cross_section(model, grid, 1000.0,
                                                     250.0 + eps))
    xm = np.asarray(compute_absorption_cross_section(model, grid, 1000.0,
                                                     250.0 - eps))
    fd = (xp - xm) / (2 * eps)
    scale = np.abs(fd).max()
    np.testing.assert_allclose(np.asarray(jac)[:, 1] / scale, fd / scale,
                               atol=1e-5)
