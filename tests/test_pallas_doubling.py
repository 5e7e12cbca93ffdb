"""Fused Pallas doubling kernel gates (interpret mode on CPU).

The kernel holds the whole doubling recursion in VMEM (see
vsmartmom/pallas/doubling_kernel.py); these gates pin it against the XLA
batched-matmul path it replaces.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vsmartmom.core.rt import (doubling, make_rsolve, ns_doubling_schedule)
from vsmartmom.pallas.doubling_kernel import fused_doubling


def _fixture(S=40, n=16, nd=6, seed=0):
    """Passive elemental-like slab (sub-stochastic r, t ~ attenuated I)."""
    rng = np.random.default_rng(seed)
    tau_scat, mqm = 0.5, 0.2
    sched = ns_doubling_schedule(tau_scat, mqm, nd)
    dtau = tau_scat / 2 ** nd
    r0 = jnp.asarray(rng.uniform(0, 1, (S, n, n)) * dtau / (n * mqm),
                     jnp.float32)
    t0 = jnp.asarray(
        np.broadcast_to(np.eye(n) * np.exp(-dtau / mqm), (S, n, n)).copy()
        + rng.uniform(0, 1, (S, n, n)) * dtau / (2 * n * mqm), jnp.float32)
    jp = jnp.asarray(rng.uniform(0, dtau, (S, n)), jnp.float32)
    jm = jnp.asarray(rng.uniform(0, dtau, (S, n)), jnp.float32)
    ek = jnp.full((S,), np.exp(-dtau / 0.7), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (S, n, n))
    return sched, r0, t0, jp, jm, ek, eye, nd


def test_fused_doubling_matches_xla():
    sched, r0, t0, jp, jm, ek, eye, nd = _fixture()
    ref = doubling(r0, t0, jp, jm, ek, nd, eye,
                   rsolve=make_rsolve("schulz", 4), ns_schedule=sched)
    out = fused_doubling(r0, t0, jp, jm, ek, ns_schedule=sched,
                         block_s=16, interpret=True)
    for name, a, b in zip(("r", "t", "jp", "jm"), ref, out):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        s = np.abs(np.asarray(a)).max()
        assert d / s < 1e-6, (name, d / s)


def test_fused_doubling_pads_ragged_nspec():
    """nSpec not a multiple of block_s: zero-padded points are inert and
    sliced away."""
    sched, r0, t0, jp, jm, ek, eye, nd = _fixture(S=40)
    out_full = fused_doubling(r0, t0, jp, jm, ek, ns_schedule=sched,
                              block_s=16, interpret=True)     # pads 40 -> 48
    out_exact = fused_doubling(r0, t0, jp, jm, ek, ns_schedule=sched,
                               block_s=8, interpret=True)     # no padding
    for a, b in zip(out_full, out_exact):
        assert a.shape[0] == 40
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-12)


def test_rt_run_band_pallas_step_engine_matches_xla():
    """Full rt_run_band with the fused doubling+interaction layer-step
    kernel (doubling_engine='pallas_step_interpret') == 'xla'."""
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [10.0], pol.n)
    rng = np.random.default_rng(1)
    n_spec, n_z = 24, 3
    tau_r = np.full((n_z, n_spec), 0.08)
    tau = tau_r + rng.uniform(0, 0.3, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    kw = dict(dtype=jnp.float32, solver="schulz")
    R_x, T_x = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="xla", **kw)
    R_p, T_p = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="pallas_step_interpret", **kw)
    np.testing.assert_allclose(R_p, R_x, rtol=2e-5, atol=1e-9)
    np.testing.assert_allclose(T_p, T_x, rtol=2e-5, atol=1e-9)


def test_rt_run_band_pallas_engine_matches_xla():
    """Full rt_run_band with doubling_engine='pallas_interpret' == 'xla'."""
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [10.0], pol.n)
    rng = np.random.default_rng(1)
    n_spec, n_z = 24, 3
    tau_r = np.full((n_z, n_spec), 0.08)
    tau = tau_r + rng.uniform(0, 0.3, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    kw = dict(dtype=jnp.float32, solver="schulz")
    R_x, T_x = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="xla", **kw)
    R_p, T_p = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="pallas_interpret", **kw)
    np.testing.assert_allclose(R_p, R_x, rtol=5e-6, atol=1e-9)
    np.testing.assert_allclose(T_p, T_x, rtol=5e-6, atol=1e-9)


def test_rt_run_band_pallas_scan_engine_matches_xla():
    """Fully-fused layer-scan kernel (interpret) == XLA path end-to-end."""
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [10.0], pol.n)
    rng = np.random.default_rng(2)
    n_spec, n_z = 24, 3
    tau_r = np.full((n_z, n_spec), 0.08)
    tau = tau_r + rng.uniform(0, 0.3, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    kw = dict(dtype=jnp.float32, solver="schulz")
    R_x, T_x = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="xla", **kw)
    R_p, T_p = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="pallas_scan_interpret", **kw)
    np.testing.assert_allclose(R_p, R_x, rtol=5e-6, atol=1e-9)
    np.testing.assert_allclose(T_p, T_x, rtol=5e-6, atol=1e-9)


def test_rt_run_band_pallas_scan_bucketed():
    """Bucketed fused layer-scan engine (per-layer static schedules on a
    widely-spread profile -> MULTIPLE chained kernels, composite passed
    kernel-to-kernel) == the XLA engine running the identical quantized
    schedules. Also covers the vacuum-composite first step (interaction
    with R=0, T=I is exact — layer_scan_kernel.py)."""
    from vsmartmom.core.rt_run import (BandRTInputs, build_layer_schedules,
                                       rt_run_band)
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [10.0], pol.n)
    rng = np.random.default_rng(5)
    n_z, n_spec = 6, 8
    tau_scat = (np.array([1e-4, 1e-3, 0.01, 0.05, 0.3, 1.0])[:, None]
                * np.ones((1, n_spec)))
    tau = tau_scat + rng.uniform(0, 0.3, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_scat / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    # engage the per-layer (bucketed) path, not the uniform one
    min_qp_mu = float(np.min(quad.qp_mu))
    _, _, scheds = build_layer_schedules(tau, tau_scat / tau, min_qp_mu,
                                         "schulz")
    assert scheds is not None and len({s[:2] for s in scheds}) >= 2
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    kw = dict(dtype=jnp.float32, solver="schulz")
    R64, _ = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf)
    R_x, T_x = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="xla", **kw)
    R_p, T_p = rt_run_band(pol, quad, band, [10.0], [30.0], 2, surf,
                           doubling_engine="pallas_scan_interpret", **kw)
    # vs the same-schedule XLA f32 engine: the kernel's in-kernel Taylor
    # _expm1 rounds differently from correctly-rounded expm1 (~2e-7/use),
    # accumulating ~1e-6 over a 12-step doubling — normalized criterion,
    # same as the fused-step schedules test below
    assert np.abs(R_p - R_x).max() / np.abs(R_x).max() < 5e-5
    assert np.abs(T_p - T_x).max() / np.abs(T_x).max() < 5e-5
    # physical accuracy vs f64 (well inside the 6SV1/Natraj gates)
    assert np.abs(R_p - R64).max() / np.abs(R64).max() < 2e-3


def test_fused_layer_step_per_layer_schedules():
    """Per-layer static (ndoubl, NS-schedule) path (engaged for real
    profiles whose doubling counts spread widely, e.g. the 34-layer
    flagship): fused interpret-mode kernels == f64 XLA reference."""
    import jax.numpy as jnp
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 10, 45.0, [0.0, 30.0],
                          pol.n)
    rng = np.random.default_rng(0)
    n_z, n_spec = 6, 8
    tau_scat = (np.array([1e-4, 1e-3, 0.01, 0.05, 0.3, 1.0])[:, None]
                * np.ones((1, n_spec)))
    tau = tau_scat + rng.uniform(0, 0.3, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_scat / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.028)])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    R64, _ = rt_run_band(pol, quad, band, [0.0, 30.0], [0.0, 90.0], 3, surf)
    R32, _ = rt_run_band(pol, quad, band, [0.0, 30.0], [0.0, 90.0], 3, surf,
                         dtype=jnp.float32, solver="schulz",
                         doubling_engine="pallas_step_interpret")
    # same-discretization cross-engine agreement: the XLA engine now runs
    # the identical quantized per-layer schedules (rt_run.py), so kernel vs
    # jnp differ only by f32 rounding/association
    R32x, _ = rt_run_band(pol, quad, band, [0.0, 30.0], [0.0, 90.0], 3,
                          surf, dtype=jnp.float32, solver="schulz",
                          doubling_engine="xla")
    assert np.abs(R32 - R32x).max() / np.abs(R64).max() < 1e-5
    # physical sanity vs f64 (different discretization: the quantized nd
    # path takes MORE doubling steps, i.e. a finer elemental slab — the
    # ~1e-3 difference is elemental truncation of the f64 baseline, well
    # inside the 6SV1 gate)
    assert np.abs(R32 - R64).max() / np.abs(R64).max() < 2e-3


def test_fused_lanes_engine():
    """Lanes-layout VPU layer-step math (the small-N production engine on
    TPU): the shared pure-jnp body == core.rt doubling+interaction on a
    physical fixture. (Pallas interpret mode is ~1000x too slow for this
    op count; the real-TPU glue is exercised by tools/check_bucketed.py
    and bench.py.)"""
    import jax.numpy as jnp
    from vsmartmom.core.rt import (LayerRT, doubling, interaction,
                                   make_rsolve, ns_doubling_schedule,
                                   vacuum_layer)
    from vsmartmom.pallas.lanes_kernel import (from_lanes_m, from_lanes_v,
                                               lanes_layer_step_math,
                                               to_lanes_m, to_lanes_v)

    rng = np.random.default_rng(3)
    S, n, nd = 24, 15, 6
    tau_scat, mqm = 0.4, 0.15
    sched = ns_doubling_schedule(tau_scat, mqm, nd)
    dtau = tau_scat / 2 ** nd
    d_vec = np.ones(n, np.float32)
    r0 = jnp.asarray(rng.uniform(0, 1, (S, n, n)) * dtau / (n * mqm),
                     jnp.float32)
    t0 = jnp.asarray(
        np.broadcast_to(np.eye(n) * np.exp(-dtau / mqm), (S, n, n)).copy()
        + rng.uniform(0, 1, (S, n, n)) * dtau / (2 * n * mqm), jnp.float32)
    jp0 = jnp.asarray(rng.uniform(0, dtau, (S, n)), jnp.float32)
    jm0 = jnp.asarray(rng.uniform(0, dtau, (S, n)), jnp.float32)
    ek = jnp.full((S,), np.exp(-dtau / 0.7), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (S, n, n))
    # a non-trivial composite to interact with
    comp = vacuum_layer(S, n, jnp.float32)
    rs = make_rsolve("schulz", 4)
    rd, td, jpd, jmd = doubling(r0, t0, jp0, jm0, ek, nd, eye, rsolve=rs,
                                ns_schedule=sched)
    sgn = d_vec[None, :, None] * d_vec[None, None, :]
    added0 = LayerRT(r_mp=rd, r_pm=sgn * rd, t_pp=td, t_mm=sgn * td,
                     j_p=jpd, j_m=jmd)
    comp = interaction(comp, added0, eye, rsolve=rs)

    # reference: doubling + interaction through core.rt
    ref_added = LayerRT(r_mp=rd, r_pm=sgn * rd, t_pp=td, t_mm=sgn * td,
                        j_p=jpd, j_m=jmd)
    ref = interaction(comp, ref_added, eye, rsolve=rs)

    # lanes math on the same inputs (flipped-space r/jm, D = +1 here)
    outs = lanes_layer_step_math(
        to_lanes_m(comp.r_mp), to_lanes_m(comp.r_pm),
        to_lanes_m(comp.t_pp), to_lanes_m(comp.t_mm),
        to_lanes_v(comp.j_p), to_lanes_v(comp.j_m),
        to_lanes_m(r0), to_lanes_m(t0), to_lanes_v(jp0), to_lanes_v(jm0),
        jnp.reshape(ek, (1, S)), jnp.asarray(d_vec).reshape(n, 1),
        ns_schedule=sched, ni=4)
    got = LayerRT(*(from_lanes_m(m) for m in outs[:4]),
                  *(from_lanes_v(v) for v in outs[4:]))
    for name in LayerRT._fields:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        assert rel < 2e-5, (name, rel)


def test_rt_run_band_lanes_engine_matches_xla():
    """End-to-end rt_run_band with doubling_engine='pallas_lanes_interpret'
    on a TINY case (interpret is slow) == 'xla' at the same schedules."""
    import jax.numpy as jnp
    from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
    from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
    from vsmartmom.util.quadrature import rt_set_streams

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [10.0], pol.n)
    rng = np.random.default_rng(1)
    n_spec, n_z = 8, 2
    tau_r = np.array([[0.02], [0.2]]) * np.ones((1, n_spec))
    tau = tau_r + rng.uniform(0, 0.1, (n_z, n_spec))
    band = BandRTInputs(tau=tau, omega=tau_r / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.03)])
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}
    kw = dict(dtype=jnp.float32, solver="schulz")
    R_x, T_x = rt_run_band(pol, quad, band, [10.0], [30.0], 1, surf,
                           doubling_engine="xla", **kw)
    R_p, T_p = rt_run_band(pol, quad, band, [10.0], [30.0], 1, surf,
                           doubling_engine="pallas_lanes_interpret", **kw)
    np.testing.assert_allclose(R_p, R_x, rtol=3e-5, atol=1e-9)
    np.testing.assert_allclose(T_p, T_x, rtol=3e-5, atol=1e-9)
