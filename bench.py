"""Headline TPU benchmark + secondary metrics.

Headline (the JSON "value"): spectral-points/s/chip for a full polarized
rt_run on the synthetic 20k-point IQUV harness (shape mirrors the
reference GPU harness, ref: test/gpu_tests/gpu_cpu_tests.jl: Float32,
n=32, nSpec=20000; kept identical across rounds so vs_baseline tracks).

extras (BASELINE.md targets), each isolated in its own try/except so one
failure can never drop the others' evidence (the round-2 flagship crash
silently discarded every secondary metric):
  flagship_o2_aband_pts_per_s — the real end-to-end default pipeline:
      default_parameters (34-layer atmosphere, O2 A band, 22669 points,
      aerosol + Rayleigh + HITRAN-style line list) -> model build with the
      Pallas Voigt kernel -> 3-moment rt_run, fused Pallas layer steps.
  flagship_rt_pts_per_s       — rt_run-only rate on the flagship model.
  voigt_lineval_per_s         — Voigt kernel line-point evaluations/s
      (lines x in-window grid points, the reference's per-line-kernel
      axis, ref: compute_absorption_cross_section.jl:117-125).
  doubling_tflops / doubling_roofline_frac — measured f32 FLOP rate of
      the fused layer-step kernel against the chip's f32-highest MXU peak
      (bf16 peak / 6 passes).
  bucketed_pallas — the per-layer-schedule bucketed engine exercised at
      flagship shape (nZ=34, heterogeneous tau) on the REAL TPU, checked
      against the XLA engine (tools/check_bucketed.py; guards the
      round-2 Mosaic-compile crash from regressing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
vs_baseline is vs the self-measured round-1 number (the reference
publishes no performance numbers; BASELINE.md).

Env:
  VSM_BENCH_PROFILE=/path  — capture a jax.profiler trace of the headline
      steady-state iterations into that directory (SURVEY.md §5.1).
"""
import json
import os
import sys
import time

import numpy as np

# Self-measured round-1 baseline (spectral-points/s, 1 TPU v5e chip,
# Newton-Schulz solver, highest matmul precision).
ROUND1_BASELINE = 1463.6
# TPU v5e: 197 bf16 TFLOP/s MXU peak; f32 at Precision.HIGHEST uses the
# 6-pass bf16 decomposition -> effective f32 peak ~32.8 TFLOP/s.
F32_PEAK_TFLOPS = 197.0 / 6.0


def headline():
    import jax
    import __graft_entry__ as g
    from vsmartmom.core.rt_run import _fourier_step, build_layer_schedules

    dtype = np.float32
    n_spec = 20_000
    args, static = g._example_inputs(n_spec=n_spec, n_quad_half=8,
                                     n_stokes=4, n_z=10, dtype=dtype)
    a = {k: jax.device_put(v) for k, v in args.items()
         if isinstance(v, np.ndarray)}

    # host-precomputed static doubling schedules via rt_run_band's OWN
    # builder (uniform layers here -> the single-static-count branch)
    mqm = float(args["min_qp_mu"])
    nd, sched, _ls = build_layer_schedules(
        args["tau"], args["omega"], mqm, "schulz")
    assert nd is not None and sched is not None and _ls is None

    def run(is_m0):
        comp, _ = _fourier_step(
            a["tau"], a["omega"], a["zw"], a["z_pp_c"], a["z_mp_c"],
            a["qp"], a["wt"], a["d_vec"], a["i0_vec"],
            args["albedo"], None, args["mu0"], args["mu0_node"],
            args["min_qp_mu"],
            i_mu0_n=static["i_mu0_n"], n_stokes=static["n_stokes"],
            is_m0=is_m0, n_spec=static["n_spec"], solver="schulz",
            ndoubl_static=nd, ns_schedule=sched,
            doubling_engine="pallas_step")
        return comp.j_m

    # NOTE: on the axon-tunneled TPU, block_until_ready returns before device
    # completion; force a host fetch of a dependent scalar to sync.
    def sync(x):
        return float(x.sum())

    sync(run(True))
    sync(run(False))
    prof_dir = os.environ.get("VSM_BENCH_PROFILE")
    if prof_dir:
        import jax.profiler
        jax.profiler.start_trace(prof_dir)
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out0 = run(True)
        out1 = run(False)
        out2 = run(False)
    sync(out0 + out1 + out2)
    dt = (time.perf_counter() - t0) / n_rep
    if prof_dir:
        jax.profiler.stop_trace()
    pts = n_spec / dt

    # analytic FLOP count of the fused layer step (doubling + interaction),
    # N=44 here: per doubling step 2N^3(6+2it); interaction ~2N^3*30
    n = int(args["qp"].shape[0])
    dbl = sum(6 + 2 * it for it in sched)
    inter = 2 * (1 + (n + 1) / n + 2 * 4 + 2 * (2 * n + 1) / n)
    flop_pt = 2 * n**3 * (dbl + inter) * 10 * 3       # 10 layers, 3 moments
    tflops = flop_pt * pts / 1e12
    return pts, tflops


def flagship():
    """End-to-end default O2 A-band pipeline on the TPU.

    Stage-isolated: a failure in rt_run cannot discard the model-build /
    Voigt numbers (round-2 lesson). The rt stage retries on the XLA
    engine if the default (Pallas) engine errors.
    """
    import jax.numpy as jnp
    from vsmartmom import default_parameters, model_from_parameters, rt_run

    out = {}
    t0 = time.perf_counter()
    params = default_parameters()
    params.float_type = "Float32"
    model = model_from_parameters(params)      # absorption: Pallas Voigt
    out["flagship_setup_s"] = round(time.perf_counter() - t0, 2)
    n_spec = model.tau_abs[0].shape[0]
    out["flagship_n_spec"] = n_spec

    # Voigt kernel line-eval rate: re-run the per-layer xsec loop alone
    t_voigt = None
    try:
        from vsmartmom.spectroscopy.profiles import compute_absorption_profile
        tau = np.zeros((n_spec, model.profile.n_layers))
        t0 = time.perf_counter()
        compute_absorption_profile(
            tau, "O2", params.absorption_params,
            np.asarray(params.spec_bands[0], np.float64),
            0.21, model.profile, engine="pallas")
        t_voigt = time.perf_counter() - t0
    except Exception as e:                     # noqa: BLE001
        out["flagship_voigt_error"] = f"{type(e).__name__}: {e}"

    def run_rt(n_steady=1):
        """First call includes jit compile; steady = best of n_steady
        repeats (the TPU tunnel adds +-15-20% noise — A/B comparisons
        need repeated runs, PERF_NOTES round 4)."""
        t0 = time.perf_counter()
        R, T = rt_run(model, dtype=jnp.float32)
        t_rt1 = time.perf_counter() - t0
        t_rt = np.inf
        for _ in range(n_steady):
            t0 = time.perf_counter()
            R, T = rt_run(model, dtype=jnp.float32)
            t_rt = min(t_rt, time.perf_counter() - t0)
        assert np.isfinite(R).all()
        return t_rt1, t_rt

    try:
        t_rt1, t_rt = run_rt(n_steady=3)
    except Exception as e:                     # noqa: BLE001
        out["flagship_error"] = f"{type(e).__name__}: {e}"
        prev_engine = os.environ.get("VSM_DOUBLING_ENGINE")
        try:                                   # record SOME end-to-end number
            os.environ["VSM_DOUBLING_ENGINE"] = "xla"
            t_rt1, t_rt = run_rt()
            out["flagship_engine_fallback"] = "xla"
        except Exception as e2:                # noqa: BLE001
            out["flagship_fallback_error"] = f"{type(e2).__name__}: {e2}"
            return out
        finally:
            if prev_engine is None:
                os.environ.pop("VSM_DOUBLING_ENGINE", None)
            else:
                os.environ["VSM_DOUBLING_ENGINE"] = prev_engine

    out["flagship_rt_pts_per_s"] = round(n_spec / t_rt, 1)
    out["flagship_compile_s"] = round(t_rt1 - t_rt, 2)
    if t_voigt is not None:
        out["flagship_o2_aband_pts_per_s"] = round(
            n_spec / (t_rt + t_voigt), 1)

    # A/B: the same flagship run with the per-layer interaction-NS
    # adaptivity disabled (uniform ni=4) — quantifies the work-reduction
    # lever of docs/PERF_NOTES.md on the real heterogeneous profile
    prev_ni = os.environ.get("VSM_FIXED_NI")
    try:
        os.environ["VSM_FIXED_NI"] = "4"
        _, t_fixed = run_rt()
        out["flagship_rt_pts_per_s_fixed_ni4"] = round(n_spec / t_fixed, 1)
    except Exception as e:                     # noqa: BLE001
        out["flagship_fixed_ni_error"] = f"{type(e).__name__}: {e}"
    finally:
        if prev_ni is None:
            os.environ.pop("VSM_FIXED_NI", None)
        else:
            os.environ["VSM_FIXED_NI"] = prev_ni

    # A/B engine sweeps on the same flagship model (best-of-3 steady):
    #   pallas_scan — bucketed fully-fused layer scan (elemental+doubling+
    #     interaction per bucket in one kernel; targets the ~15% scan-body
    #     XLA share measured in PERF_NOTES round 4)
    #   pallas_dd — direct/diffuse split engine (bf16x3-safe)
    prev_eng = os.environ.get("VSM_DOUBLING_ENGINE")
    for eng, tag in (("pallas_scan", "scan"), ("pallas_dd", "dd")):
        try:
            os.environ["VSM_DOUBLING_ENGINE"] = eng
            t_e1, t_e = run_rt(n_steady=3)
            out[f"flagship_rt_pts_per_s_{tag}"] = round(n_spec / t_e, 1)
            out[f"flagship_{tag}_compile_s"] = round(t_e1 - t_e, 2)
        except Exception as e:                 # noqa: BLE001
            out[f"flagship_{tag}_error"] = f"{type(e).__name__}: {e}"
    if prev_eng is None:
        os.environ.pop("VSM_DOUBLING_ENGINE", None)
    else:
        os.environ["VSM_DOUBLING_ENGINE"] = prev_eng
    return out


def raman_rrs():
    """Rotational-Raman (ring-effect) TPU throughput: Cabannes elastic run
    + first-order RRS source coupling across the full +-~194 cm^-1 shift
    range (ref: the reference's RRS path, rt_run.jl + CoreKernel/
    *_inelastic.jl, measured here as spectral-points/s on one chip)."""
    import jax.numpy as jnp
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    from vsmartmom.core.rt_run import BandRTInputs
    from vsmartmom.scattering.phase import get_greek_rayleigh
    from vsmartmom.inelastic.rrs import make_rrs
    from vsmartmom.scattering.phase import Polarization
    from vsmartmom.util.quadrature import rt_set_streams

    n_spec = 2048
    grid = 12700.0 + 0.25 * np.arange(n_spec)      # 512 cm^-1 span
    rrs = make_rrs(grid, T=250.0)
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [0.0], pol.n)
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.05}
    n_z = 10
    rng = np.random.default_rng(0)
    tau_rayl = np.full((n_z, n_spec), 0.04)
    # absorption lines -> ring-effect configuration (filling-in visible)
    tau_abs = 0.3 * rng.random((n_z, 1)) * np.exp(
        -0.5 * ((grid - 12950.0) / 2.0) ** 2)[None, :]
    tau = tau_rayl + tau_abs
    f_rayl = tau_rayl / tau
    band = BandRTInputs(
        tau=tau, omega=tau_rayl * rrs.omega_cabannes / tau,
        zw=np.ones((n_z, 1, n_spec)),
        greeks=[get_greek_rayleigh(rrs.depol_rayl)])

    def run():
        t0 = time.perf_counter()
        R, T, ieR, ieT = rt_run_band_rrs(
            pol, quad, band, rrs, f_rayl, [30.0], [0.0], 3, surf,
            dtype=jnp.float32)
        dt = time.perf_counter() - t0
        assert np.isfinite(ieR).all() and (np.asarray(ieR) != 0).any()
        return dt

    t_warm = run()                             # includes jit compile
    t_steady = run()
    return {"raman_rrs_pts_per_s": round(n_spec / t_steady, 1),
            "raman_rrs_compile_s": round(t_warm - t_steady, 2),
            "raman_rrs_n_spec": n_spec}


def _voigt_kernel_rate():
    """Saturated Voigt-kernel throughput: line-point evaluations/s on a
    dense case (the 2600-line CO2 HAPI band, 40001-point grid — the O2 A
    band's ~100 lines are launch-overhead-dominated and undersell it)."""
    from vsmartmom.spectroscopy.hitran import read_linelist_npz
    from vsmartmom.spectroscopy.voigt import (line_parameters,
                                              make_hitran_model,
                                              make_voigt_plan)
    npz = os.path.join(os.path.dirname(__file__), "data", "hitran",
                       "CO2.npz")
    if not os.path.exists(npz):
        return None
    ht = read_linelist_npz(npz, 2)
    model = make_hitran_model(ht, "Voigt")
    grid = 6000.0 + 0.01 * np.arange(40001)
    plan = make_voigt_plan(model, grid)
    pars = line_parameters(model, 750.0, 296.0)
    plan.run(*pars)                                     # compile/warm
    n_rep = 10
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = plan.run(*line_parameters(model, 700.0 + 10 * i, 280.0))
    float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / n_rep
    evals = len(ht.nu) * (2 * model.wing_cutoff / 0.01)
    return round(evals / dt, 0)


def main():
    extras = {}

    # Persistent XLA compilation cache: the flagship's 35-45s compiles
    # become disk hits on later runs in the same environment. Entry counts
    # before/after record whether it engaged (Mosaic kernels included).
    try:
        import jax
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/vsm_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        extras["compile_cache_entries_before"] = (
            len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0)
    except Exception as e:                     # noqa: BLE001
        extras["compile_cache_error"] = f"{type(e).__name__}: {e}"

    def stage(name, fn):
        """Isolate each metric: one failure never hides the others."""
        try:
            return fn()
        except Exception as e:                 # noqa: BLE001
            extras[f"{name}_error"] = f"{type(e).__name__}: {e}"
            return None

    res = stage("headline", headline)
    if res is not None:
        pts, tflops = res
        extras["doubling_tflops"] = round(tflops, 2)
        extras["doubling_roofline_frac"] = round(tflops / F32_PEAK_TFLOPS, 4)
    else:
        pts = 0.0

    rate = stage("voigt", _voigt_kernel_rate)
    if rate is not None:
        extras["voigt_lineval_per_s"] = rate

    fl = stage("flagship", flagship)
    if fl:
        extras.update(fl)

    rr = stage("raman_rrs", raman_rrs)
    if rr:
        extras.update(rr)

    def bucketed():
        from tools.check_bucketed import run_check
        return run_check(n_spec=2048)
    bk = stage("bucketed_pallas", bucketed)
    if bk is not None:
        extras["bucketed_pallas"] = bk

    try:
        extras["compile_cache_entries_after"] = (
            len(os.listdir("/tmp/vsm_jax_cache"))
            if os.path.isdir("/tmp/vsm_jax_cache") else 0)
    except Exception:                          # noqa: BLE001
        pass

    vs = pts / ROUND1_BASELINE
    print(json.dumps({
        "metric": "rt_run_spectral_points_per_s",
        "value": round(pts, 1),
        "unit": "spectral-points/s/chip (full 3-moment polarized rt_run, "
                "nSpec=20000, IQUV, N=44, 10 layers)",
        "vs_baseline": round(vs, 3),
        "extras": extras}))


if __name__ == "__main__":
    sys.exit(main())
