"""Headline benchmark: spectral-points/s/chip for a full polarized rt_run.

Runs the complete Fourier-moment RT pipeline (3 moments x layer scan with
elemental/doubling/interaction + surface) on an O2 A-band-like atmosphere:
20 000 spectral points, 16-stream IQUV quadrature (N = 4*Nquad), 10 layers
with mixed scattering/absorption — mirroring the reference GPU harness shape
(ref: test/gpu_tests/gpu_cpu_tests.jl: Float32, n=32, nSpec=20000).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs the self-measured round-1 number recorded below (the
reference publishes no performance numbers; BASELINE.md).
"""
import json
import sys
import time

import numpy as np

# Self-measured round-1 baseline (spectral-points/s, 1 TPU v5e chip,
# Newton-Schulz solver, highest matmul precision).
ROUND1_BASELINE = 1463.6


def main():
    import jax
    import __graft_entry__ as g

    dtype = np.float32
    n_spec = 20_000
    args, static = g._example_inputs(n_spec=n_spec, n_quad_half=8,
                                     n_stokes=4, n_z=10, dtype=dtype)
    from vsmartmom.core.rt_run import _fourier_step

    a = {k: jax.device_put(v) for k, v in args.items()
         if isinstance(v, np.ndarray)}

    # host-precomputed static doubling count (uniform layers here), the
    # same decision rt_run_band makes
    tau_scat = float(np.max(args["tau"] * args["omega"]))
    mqm = float(args["min_qp_mu"])
    dmax = min(tau_scat, 0.004 * mqm)
    nd = int(np.ceil(np.log2(max(tau_scat / dmax, 1.0))))
    from vsmartmom.core.rt import ns_doubling_schedule
    sched = ns_doubling_schedule(tau_scat, mqm, nd)

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

    # Warm-up / compile both Fourier variants (m=0 and m>0)
    sync(run(True))
    sync(run(False))

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out0 = run(True)
        out1 = run(False)
        out2 = run(False)
    sync(out0 + out1 + out2)
    dt = (time.perf_counter() - t0) / n_rep

    pts_per_s = n_spec / dt
    vs = 1.0 if ROUND1_BASELINE is None else pts_per_s / ROUND1_BASELINE
    print(json.dumps({
        "metric": "rt_run_spectral_points_per_s",
        "value": round(pts_per_s, 1),
        "unit": f"spectral-points/s/chip (full 3-moment polarized rt_run, "
                f"nSpec=20000, IQUV, N={args['qp'].shape[0]}, 10 layers)",
        "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    sys.exit(main())
