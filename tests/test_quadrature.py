"""Unit tests for quadrature stream construction."""
import numpy as np

from vsmartmom.util.quadrature import (gauss_radau, gauleg, rt_set_streams)


def test_gauss_radau_n2():
    # Known 2-point Radau rule: nodes {-1, 1/3}, weights {1/2, 3/2}
    x, w = gauss_radau(2)
    np.testing.assert_allclose(x, [-1.0, 1.0 / 3.0], atol=1e-14)
    np.testing.assert_allclose(w, [0.5, 1.5], atol=1e-14)


def test_gauss_radau_integrates_polynomials():
    # n-point Radau is exact for polynomials of degree <= 2n-2
    n = 7
    x, w = gauss_radau(n)
    for deg in range(2 * n - 1):
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x**deg), exact, atol=1e-12)


def test_gauleg_integrates():
    x, w = gauleg(8, 0.0, 1.0)
    np.testing.assert_allclose(np.sum(w * x**3), 0.25, atol=1e-13)
    assert np.all((x > 0) & (x < 1))


def test_radau_streams_include_sun_as_full_node():
    sza = 45.0
    quad = rt_set_streams("RadauQuad", 20, sza, [10.0, 30.0], 4)
    mu0 = np.cos(np.deg2rad(sza))
    # Direct beam direction must be a *weighted* node (DNI)
    assert np.isclose(quad.qp_mu[quad.i_mu0], mu0, atol=1e-14)
    assert quad.wt_mu[quad.i_mu0] > 0
    # Camera angles appended with zero weight
    for v in [10.0, 30.0]:
        i = np.argmin(np.abs(quad.qp_mu - np.cos(np.deg2rad(v))))
        assert np.isclose(quad.qp_mu[i], np.cos(np.deg2rad(v)), atol=1e-14)
    # Stokes expansion replicates each node n times
    assert len(quad.qp_mu_n) == 4 * quad.n_quad
    # Full quadrature weights integrate mu over [0,1]
    np.testing.assert_allclose(np.sum(quad.wt_mu), 1.0, atol=1e-12)


def test_fullsphere_streams():
    quad = rt_set_streams("GaussQuadFullSphere", 20, 30.0, [0.0], 1)
    np.testing.assert_allclose(np.sum(quad.wt_mu), 1.0, atol=1e-12)
    assert np.all(quad.qp_mu > 0)
