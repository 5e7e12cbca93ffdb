"""Stage-level device profile of the flagship O2 A-band rt_run.

Captures one steady-state flagship rt_run under jax.profiler and
aggregates device-stream op durations from the Chrome-trace export into
stage buckets (Pallas fused layer-step kernel / XLA elemental+assembly
fusions / data movement), plus the host-side wall split between the
Fourier-loop device work and pre/post-processing. The summary feeds
docs/PERF_NOTES.md (SURVEY.md §5.1 tracing parity: the reference prints a
TimerOutputs stage table after every run, ref: rt_run.jl:219-220).

Usage: python tools/profile_flagship.py [outdir]
Prints one JSON summary line; the raw trace stays in outdir for
tensorboard.
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(outdir):
    import jax
    import jax.numpy as jnp
    from vsmartmom import default_parameters, model_from_parameters, rt_run

    params = default_parameters()
    params.float_type = "Float32"
    t0 = time.perf_counter()
    model = model_from_parameters(params)
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    R, T = rt_run(model, dtype=jnp.float32)          # compile + run
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    R, T = rt_run(model, dtype=jnp.float32)          # steady
    t_steady = time.perf_counter() - t0

    jax.profiler.start_trace(outdir)
    t0 = time.perf_counter()
    R, T = rt_run(model, dtype=jnp.float32)
    t_traced = time.perf_counter() - t0
    jax.profiler.stop_trace()
    n_spec = model.tau_abs[0].shape[0]
    return {"setup_s": round(t_setup, 2), "warm_s": round(t_warm, 2),
            "steady_s": round(t_steady, 3), "traced_s": round(t_traced, 3),
            "n_spec": n_spec}


def parse_trace(outdir):
    """Aggregate device-lane op durations from the Chrome trace export."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return {"trace_parse_error": "no .trace.json.gz produced"}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    ev = trace.get("traceEvents", [])

    # pid -> process name (device streams vs host threads); tid -> lane.
    # TPU traces nest module/region events above the leaf op events on
    # separate lanes — aggregate ONLY the "XLA Ops" leaf lanes, otherwise
    # parents double-count their children.
    pname = {}
    tname = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e["pid"], e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pname.items()
                if any(k in n for k in ("TPU", "Axon", "/device"))
                and "Host" not in n}
    op_lanes = {k for k, n in tname.items()
                if k[0] in dev_pids and "XLA Ops" in n}

    def is_leaf_lane(e):
        if op_lanes:
            return (e.get("pid"), e.get("tid")) in op_lanes
        # fallback: all device lanes minus obvious region wrappers
        return (e.get("pid") in dev_pids
                and not e.get("name", "").startswith(
                    ("jit_", "while", "Steps", "step", "body")))

    by_name = {}
    t_lo, t_hi = np.inf, -np.inf
    for e in ev:
        if e.get("ph") != "X" or not is_leaf_lane(e):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        by_name[name] = by_name.get(name, 0.0) + dur
        t_lo = min(t_lo, e["ts"])
        t_hi = max(t_hi, e["ts"] + dur)

    if not by_name:
        return {"trace_parse_error":
                f"no device events (procs: {sorted(set(pname.values()))})"}

    def bucket(name):
        n = name.lower()
        if "layer_step" in n or "custom-call" in n or "mosaic" in n:
            return "pallas_layer_step"          # doubling+interaction fused
        if "fusion" in n or "multiply" in n or "add" in n or "exp" in n:
            return "xla_fusions(elemental/Z/postassembly)"
        if "copy" in n or "transpose" in n or "slice" in n \
                or "concatenate" in n:
            return "data_movement"
        if "dot" in n or "einsum" in n or "convolution" in n:
            return "xla_matmul"
        return "other"

    buckets = {}
    for name, dur in by_name.items():
        buckets[bucket(name)] = buckets.get(bucket(name), 0.0) + dur
    total = sum(by_name.values())
    span = t_hi - t_lo
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:12]
    return {
        "device_busy_ms": round(total / 1e3, 2),
        "device_span_ms": round(span / 1e3, 2),
        "device_busy_frac_of_span": round(total / span, 3) if span else None,
        "bucket_shares": {k: round(v / total, 3)
                          for k, v in sorted(buckets.items(),
                                             key=lambda kv: -kv[1])},
        "top_ops": [{"name": n[:80], "ms": round(d / 1e3, 2),
                     "share": round(d / total, 3)} for n, d in top],
    }


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vsm_profile"
    os.makedirs(outdir, exist_ok=True)
    summary = capture(outdir)
    summary.update(parse_trace(outdir))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
