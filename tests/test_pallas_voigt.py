"""Pallas Voigt kernel gates (interpret mode on CPU; compiled on TPU).

1. Real-arithmetic Faddeeva == the complex CEF implementation.
2. Tiled kernel == dense wofz reference at f32 tolerance.
3. VoigtPlan == one-shot wrapper; engine='pallas' == engine='dense'
   through the spectroscopy API on the CO2 parser fixture.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vsmartmom.pallas.voigt_kernel import (VoigtPlan, rew_hw32sd,
                                           voigt_xsec_pallas)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_rew_matches_complex_cef():
    from vsmartmom.spectroscopy.cef import w_humlicek_weideman32_sd
    rng = np.random.default_rng(0)
    x = rng.uniform(-30, 30, 1000)
    y = 10 ** rng.uniform(-4, 1.2, 1000)
    mine = np.asarray(rew_hw32sd(jnp.asarray(x), jnp.asarray(y)))
    ref = np.real(np.asarray(w_humlicek_weideman32_sd(
        jnp.asarray(x + 1j * y))))
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-12)


def _rand_problem(n_l=400, n_g=2100, seed=3):
    rng = np.random.default_rng(seed)
    grid = np.linspace(13000.0, 13080.0, n_g)
    nu = rng.uniform(12995.0, 13085.0, n_l)
    S = 10 ** rng.uniform(-3, 0, n_l)
    gd = rng.uniform(0.01, 0.03, n_l)
    yv = rng.uniform(0.05, 4.0, n_l)
    return grid, nu, S, gd, yv


def _dense_truth(grid, nu, S, gd, yv, cut):
    from scipy.special import wofz
    SQRT_LN2, C = 0.8325546111576977, 0.46971863934982566
    dx = grid[None, :] - nu[:, None]
    prof = (C / gd[:, None]
            * wofz(SQRT_LN2 / gd[:, None] * dx + 1j * yv[:, None]).real)
    return np.where(np.abs(dx) <= cut, S[:, None] * prof, 0).sum(0)


def test_kernel_vs_dense():
    grid, nu, S, gd, yv = _rand_problem()
    cut = 10.0
    sig = voigt_xsec_pallas(grid, nu, S, gd, yv, cut)
    dense = _dense_truth(grid, nu, S, gd, yv, cut)
    assert np.abs(sig - dense).max() / dense.max() < 5e-4


def test_plan_matches_oneshot():
    grid, nu, S, gd, yv = _rand_problem(seed=5)
    cut = 8.0
    plan = VoigtPlan(grid, nu, cut)
    sig_plan = np.asarray(plan.run(nu, S, gd, yv))
    sig_once = voigt_xsec_pallas(grid, nu, S, gd, yv, cut)
    np.testing.assert_allclose(sig_plan, sig_once, rtol=2e-5,
                               atol=1e-6 * sig_once.max())


def test_engine_pallas_matches_dense_api():
    from vsmartmom.spectroscopy.hitran import read_hitran
    from vsmartmom.spectroscopy.voigt import (
        compute_absorption_cross_section, make_hitran_model)
    ht = read_hitran(os.path.join(DATA, "testCO2.par"))
    model = make_hitran_model(ht, wing_cutoff=40.0)
    grid = np.arange(6214.0, 6214.8, 0.002)
    ref = np.asarray(compute_absorption_cross_section(
        model, grid, 1000.0, 296.0))
    got = np.asarray(compute_absorption_cross_section(
        model, grid, 1000.0, 296.0, engine="pallas"))
    assert np.abs(got - ref).max() < 1e-3 * ref.max() + 1e-30
