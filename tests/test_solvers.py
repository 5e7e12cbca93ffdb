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


def test_ns_schedule_matches_fixed_iterations():
    """Scheduled Newton-Schulz doubling == fixed-4 doubling to f64 rounding
    on a random elemental layer (the schedule's slab-albedo bound keeps the
    residual below tolerance at every step)."""
    import jax
    from vsmartmom.core.rt import (doubling, make_rsolve,
                                   ns_doubling_schedule, ns_iters_for_bound)

    assert ns_iters_for_bound(0.0) == 0
    assert ns_iters_for_bound(1e-9) == 0
    assert ns_iters_for_bound(0.99) == 4          # capped
    # residual guarantee: b^(2^(i+1)) <= tol
    for b in (1e-5, 1e-3, 0.05, 0.3, 0.8):
        i = ns_iters_for_bound(b, tol=1e-8, cap=10)
        assert b ** (2 ** (i + 1)) <= 1e-8 * (1 + 1e-12), (b, i)

    rng = np.random.default_rng(7)
    n, ns, nd = 24, 16, 8
    tau_scat, mqm = 0.6, 0.15
    sched = ns_doubling_schedule(tau_scat, mqm, nd)
    assert len(sched) == nd and list(sched) == sorted(sched)

    dtau = tau_scat / 2 ** nd
    r0 = jnp.asarray(rng.uniform(0, 1.0, (ns, n, n)) * dtau / mqm)
    t0 = jnp.asarray(np.broadcast_to(np.eye(n) * np.exp(-dtau / 0.5),
                                     (ns, n, n)))
    jp = jnp.asarray(rng.uniform(0, dtau, (ns, n)))
    jm = jnp.asarray(rng.uniform(0, dtau, (ns, n)))
    ek = jnp.full((ns,), np.exp(-dtau / 0.7))
    eye = jnp.broadcast_to(jnp.eye(n), (ns, n, n))

    ref = doubling(r0, t0, jp, jm, ek, nd, eye,
                   rsolve=make_rsolve("schulz", 4))
    out = doubling(r0, t0, jp, jm, ek, nd, eye,
                   rsolve=make_rsolve("schulz", 4), ns_schedule=sched)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-8, atol=1e-12)
