"""Newton-Schulz right-solve must match LU to near machine precision on the
operator magnitudes the RT core produces (rho(B) < ~0.6)."""
import numpy as np
import jax.numpy as jnp

from vsmartmom.core.rt import make_rsolve


def test_schulz_matches_lu():
    rng = np.random.default_rng(42)
    n, ns = 44, 32
    for rho in (1e-6, 0.1, 0.4, 0.6):
        b = rng.standard_normal((ns, n, n))
        for i in range(ns):
            b[i] *= rho / np.abs(np.linalg.eigvals(b[i])).max()
        a = jnp.asarray(np.eye(n)[None] - b)
        x = jnp.asarray(rng.standard_normal((ns, n, n)))
        lu = make_rsolve("lu")(x, a)
        sch = make_rsolve("schulz", 5)(x, a)
        err = np.abs(np.asarray(lu - sch)).max() / np.abs(np.asarray(lu)).max()
        assert err < 5e-11, (rho, err)


def test_schulz_full_rt_matches_lu_gate():
    """Full Rayleigh RT with schulz solver still passes the Natraj I gate."""
    import os
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    d = np.load(os.path.join(os.path.dirname(__file__), "data",
                             "natraj_trues.npz"))
    mu = np.array([0.02, 0.2, 0.52, 1.00])
    idx = [0, 4, 8, 15]
    vza = np.degrees(np.arccos(mu))
    sza = np.degrees(np.arccos(0.2))
    pol = Polarization.from_name("Stokes_IQUV")
    quad = rt_set_streams("RadauQuad", 20, sza, vza, pol.n)
    band = BandRTInputs(tau=np.full((1, 2), 0.5), omega=np.ones((1, 2)),
                        zw=np.ones((1, 1, 2)),
                        greeks=[get_greek_rayleigh(0.0)])
    R, _ = rt_run_band(pol, quad, band, vza, [0.0] * 4, 3,
                       {"type": "LambertianSurfaceScalar", "albedo": 0.0},
                       solver="schulz")
    i_err = np.abs(d["I_trues"][idx, 0] - R[:, 0, 0]) / d["I_trues"][idx, 0]
    assert i_err.max() < 0.002, i_err
