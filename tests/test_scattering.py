"""Mie/NAI2 scattering tests.

Gates (mirroring test_Scattering.jl): NAI2 Greek coefficients vs the
independent PCW (Domke/Wigner) gold values; plus physical-limit checks on
the Mie machinery.
"""
import os

import numpy as np
import pytest

from vsmartmom.scattering.mie import (Aerosol, compute_mie_ab_batch,
                                      get_n_max, phase_function,
                                      phase_function_monodisperse)
from vsmartmom.scattering.nai2 import (compute_aerosol_optical_properties,
                                       compute_ref_aerosol_extinction)
from vsmartmom.scattering.truncation import reconstruct_phase, truncate_phase

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_mie_ab_rayleigh_limit():
    """Small-sphere limit: a1 -> -2i/3 x^3 (m^2-1)/(m^2+2), b1 ~ O(x^5)."""
    m = complex(1.5, 0.0)
    x = np.array([1e-3])
    an, bn = compute_mie_ab_batch(x, m, 5, truncate=False)
    a1_analytic = -2j / 3 * x[0] ** 3 * (m**2 - 1) / (m**2 + 2)
    assert abs(an[0, 0] - a1_analytic) / abs(a1_analytic) < 1e-4
    assert abs(bn[0, 0]) < abs(an[0, 0]) * 1e-2


def test_extinction_efficiency_large_sphere():
    """Large-sphere extinction paradox: Q_ext -> ~2."""
    lam, r = 0.55, 20.0
    mu, w_mu, f11, c_ext, c_sca, g = phase_function_monodisperse(
        r, lam, 1.33, 0.0)
    q_ext = c_ext / (np.pi * r**2)
    assert 1.9 < q_ext < 2.3
    # phase function normalization: 1/2 int p dmu = 1
    assert np.sum(w_mu * f11) / 2 == pytest.approx(1.0, rel=1e-6)
    assert 0.5 < g < 1.0


def test_nai2_matches_pcw_gold():
    """NAI2 vs independent PCW decomposition (ref: test_Scattering.jl:68-124,
    gold values from the stored PCW_AerosolOptics fixture)."""
    gold = np.load(f"{DATA}/pcw_gold_optics.npz")
    aero = Aerosol(mu=0.3, sigma=6.82, n_r=1.3, n_i=0.001)
    optics = compute_aerosol_optical_properties(aero, 0.55, 30.0, 2500)
    gc = optics.greek_coefs
    assert optics.ssa == pytest.approx(float(gold["ssa"]), rel=1e-6)
    assert optics.k == pytest.approx(float(gold["k"]), rel=1e-6)
    for name in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta"):
        ours = getattr(gc, {"epsilon": "epsilon"}.get(name, name))
        ref = gold[name]
        n = min(len(ours), len(ref))
        num = np.linalg.norm(ours[:n] - ref[:n])
        den = max(np.linalg.norm(ref[:n]), 1e-30)
        assert num / den < 1e-6, (name, num / den)


def test_nai2_rayleigh_limit_phase():
    """Tiny particles: Greek beta ~ Rayleigh [1, 0, 0.5]."""
    aero = Aerosol(mu=0.001, sigma=1.1, n_r=1.45, n_i=0.0)
    optics = compute_aerosol_optical_properties(aero, 0.55, 0.01, 200)
    b = optics.greek_coefs.beta
    assert b[0] == pytest.approx(1.0, abs=1e-8)
    assert abs(b[1]) < 1e-3
    assert b[2] == pytest.approx(0.5, abs=1e-3)
    assert np.abs(b[3:]).max() < 1e-3


def test_ref_extinction_consistent():
    aero = Aerosol(mu=0.3, sigma=2.0, n_r=1.3, n_i=1e-8)
    k_ref = compute_ref_aerosol_extinction(aero, 0.77,
                                           complex(1.3, -1e-8), 50.0, 800)
    optics = compute_aerosol_optical_properties(aero, 0.77, 50.0, 800)
    assert k_ref == pytest.approx(optics.k, rel=1e-10)


def test_truncate_phase():
    """delta-BGE truncation: renormalized, shorter series, f_t in (0,1)."""
    aero = Aerosol(mu=0.3, sigma=2.0, n_r=1.3, n_i=1e-8)
    optics = compute_aerosol_optical_properties(aero, 0.77, 10.0, 600)
    trunc = truncate_phase(optics, 20, 2.0)
    assert trunc.greek_coefs.l_max == 20
    assert 0.0 < trunc.f_t < 1.0
    # truncated beta renormalized: beta[0] == 1
    assert trunc.greek_coefs.beta[0] == pytest.approx(1.0)
    # reconstructed truncated phase function integrates to 1
    mu, w_mu = np.polynomial.legendre.leggauss(200)
    sm = reconstruct_phase(trunc.greek_coefs, mu)
    assert np.sum(w_mu * sm.f11) / 2 == pytest.approx(1.0, rel=1e-8)
    # away from the forward peak, truncated ~ full phase function
    sm_full = reconstruct_phase(optics.greek_coefs, mu)
    sel = mu < np.cos(np.deg2rad(30.0))
    rel = np.abs(sm.f11[sel] * (1 - trunc.f_t) - sm_full.f11[sel]) \
        / sm_full.f11[sel]
    assert np.median(rel) < 0.2


def test_phase_function_distribution():
    aero = Aerosol(mu=0.2, sigma=1.5, n_r=1.4, n_i=0.0)
    mu, w_mu, p, c_ext, c_sca, g = phase_function(aero, 0.55, 5.0, 400)
    assert np.sum(w_mu * p) / 2 == pytest.approx(1.0, rel=1e-8)
    assert c_sca <= c_ext * (1 + 1e-12)
    assert 0.0 < g < 1.0


def test_wigner3j_vs_sympy():
    """Wigner 3j (all three PCW configs) vs sympy's exact values, random
    (m, n, l) up to j = 120 (ref: test_Scattering.jl:2-65 vs
    WignerSymbols.jl up to j = 300; sympy is slower, so fewer/smaller)."""
    from sympy.physics.wigner import wigner_3j

    from vsmartmom.scattering.wigner import wigner3j

    rng = np.random.default_rng(7)
    configs = [(-1, 1, 0), (-1, -1, 2), (0, 0, 0)]
    for _ in range(60):
        j2 = int(rng.integers(1, 120))
        j3 = int(rng.integers(0, 120))
        j1 = int(rng.integers(0, j2 + j3 + 2))
        m1, m2, m3 = configs[rng.integers(0, 3)]
        if abs(m3) > j3:
            continue
        truth = float(wigner_3j(j1, j2, j3, m1, m2, m3))
        assert wigner3j(j1, j2, j3, m1, m2, m3) == pytest.approx(
            truth, rel=1e-9, abs=1e-12)


def test_wigner_table_save_load(tmp_path):
    from vsmartmom.scattering.wigner import (compute_wigner_values,
                                             load_wigner_values,
                                             save_wigner_values)
    A, B = compute_wigner_values(6)
    path = str(tmp_path / "wigner.npz")
    save_wigner_values(path, A, B)
    A2, B2 = load_wigner_values(path)
    np.testing.assert_array_equal(A, A2)
    np.testing.assert_array_equal(B, B2)


def test_pcw_matches_nai2():
    """The two independent Mie decompositions must agree
    (ref: test_Scattering.jl:68-124; here both sides are computed live)."""
    from vsmartmom.scattering.pcw import compute_aerosol_optical_properties_pcw

    aero = Aerosol(mu=0.2, sigma=1.8, n_r=1.4, n_i=0.003)
    o_nai2 = compute_aerosol_optical_properties(aero, 0.55, 5.0, 500)
    o_pcw = compute_aerosol_optical_properties_pcw(aero, 0.55, 5.0, 500)
    assert o_pcw.ssa == pytest.approx(o_nai2.ssa, rel=1e-9)
    assert o_pcw.k == pytest.approx(o_nai2.k, rel=1e-9)
    for name in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta"):
        a = getattr(o_nai2.greek_coefs, name)
        b = getattr(o_pcw.greek_coefs, name)
        n = min(len(a), len(b))
        num = np.linalg.norm(a[:n] - b[:n])
        den = max(np.linalg.norm(b[:n]), 1e-30)
        assert num / den < 1e-8, (name, num / den)
