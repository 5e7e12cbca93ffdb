"""ABSCO reader gates: synthetic HDF5 table -> AbscoTable -> LUT model.

The table's sigma is an analytic separable function so the resampled LUT
can be checked pointwise (ref: make_model_helpers.jl:112-174 semantics:
per-pressure temperature coordinates, Pa -> hPa conversion).
"""
import numpy as np
import pytest

from vsmartmom.spectroscopy.absco import (AbscoTable,
                                          absco_to_interpolation_model,
                                          load_absco)


def _sigma_fn(nu, T, p_hpa):
    return (1e-25 * (1 + 0.01 * (nu - 13000.0))
            * (T / 250.0) * (p_hpa / 500.0))


def _make_table():
    nu = np.linspace(12990.0, 13010.0, 201)
    p_hpa = np.array([100.0, 400.0, 700.0, 1000.0])
    # per-pressure T coordinates (ABSCO style)
    T = np.stack([np.linspace(180.0 + 5 * i, 300.0 + 5 * i, 5)
                  for i in range(len(p_hpa))], axis=1)   # (n_T, n_p)
    sigma = np.zeros((len(nu), 1, T.shape[0], len(p_hpa)), np.float32)
    for ip in range(len(p_hpa)):
        for it in range(T.shape[0]):
            sigma[:, 0, it, ip] = _sigma_fn(nu, T[it, ip], p_hpa[ip])
    return AbscoTable(mol=2, iso=-1, nu=nu, sigma=sigma, p=p_hpa, T=T)


def test_load_absco_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    tab = _make_table()
    path = str(tmp_path / "absco_test.h5")
    with h5py.File(path, "w") as f:
        f["Gas_Index"] = np.array([b"02"])
        f["Gas_02_Absorption"] = tab.sigma
        f["Temperature"] = tab.T
        f["Pressure"] = tab.p * 100.0        # stored in Pa
        f["Wavenumber"] = tab.nu
    loaded = load_absco(path)
    assert loaded.mol == 2
    np.testing.assert_allclose(loaded.p, tab.p)
    np.testing.assert_allclose(loaded.nu, tab.nu)
    np.testing.assert_allclose(loaded.sigma, tab.sigma, rtol=1e-6)


def test_absco_interpolation_model():
    tab = _make_table()
    nu_grid = np.linspace(12995.0, 13005.0, 51)
    p_grid = np.array([200.0, 500.0, 900.0])
    t_grid = np.array([220.0, 260.0, 290.0])
    model = absco_to_interpolation_model(tab, nu_grid, p_grid, t_grid)
    for pv in (250.0, 800.0):
        for tv in (230.0, 280.0):
            got = model(nu_grid, pv, tv)
            expect = _sigma_fn(nu_grid, tv, pv)
            np.testing.assert_allclose(got, expect, rtol=5e-3)
