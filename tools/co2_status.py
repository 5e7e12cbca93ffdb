"""Measure the shipped CO2 fit through the PRODUCTION path and record it.

Runs the exact computation the achieved-tolerance gate runs
(tests/test_hapi_gate.py: read_linelist_npz -> make_hitran_model ->
compute_absorption_cross_section) over the full 5x5 (p, T) grid against
the reference's HAPI truth CSVs, then writes the result to
data/fit_state/CO2_polish_status.json. The gate derives its tolerance
from this artifact (x a fixed headroom factor), so a shipped-artifact
regression fails the suite instead of hiding under a stale hand-written
constant. Touches data/fit_state/CO2_fit_converged when the measured
error crosses the strict reference gate (3.6e-27,
ref: test/test_Absorption.jl:76-117).

Usage: JAX_PLATFORMS=cpu python tools/co2_status.py
"""
import json
import os
import sys

import numpy as np

import jax

# the gate (tests/conftest.py) measures in f64 on CPU; without x64 the
# f32 line-sum accumulation alone reads ~5e-24 (measured) — 8x above the
# artifact's true error
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/test/test_profiles"
STATE = os.path.join(REPO, "data", "fit_state")
GRID = 6000.0 + 0.01 * np.arange(40001)
EPS_STRICT = 3.6e-27


def measure():
    from vsmartmom.spectroscopy.hitran import read_linelist_npz
    from vsmartmom.spectroscopy.voigt import (
        compute_absorption_cross_section, make_hitran_model)
    ht = read_linelist_npz(os.path.join(STATE, "CO2_fit.npz"), 2)
    model = make_hitran_model(ht, "Voigt")
    worst = 0.0
    worst_cond = None
    for T in (100, 175, 250, 325, 400):
        for P in (250, 500, 750, 1000, 1250):
            truth = np.loadtxt(
                os.path.join(REF, f"Voigt_CO2_T{T}_P{P}.csv"))
            ours = np.asarray(compute_absorption_cross_section(
                model, GRID, float(P), float(T)))
            err = float(np.abs(ours - truth).max())
            if err > worst:
                worst, worst_cond = err, (T, P)
    return len(ht), worst, worst_cond


def main(rnd=5):
    n_lines, err, cond = measure()
    status = {
        "round": rnd,
        "lines": n_lines,
        "max_abs_err_25cond_production_path": err,
        "worst_condition_T_P": list(cond),
        "gate_strict": EPS_STRICT,
        "note": "written by tools/co2_status.py; see docs/CO2_FIT.md",
    }
    with open(os.path.join(STATE, "CO2_polish_status.json"), "w") as f:
        json.dump(status, f, indent=1)
    marker = os.path.join(STATE, "CO2_fit_converged")
    if err < EPS_STRICT:
        open(marker, "w").write(f"{err:.3e}\n")
        print(f"CO2 fit CONVERGED at {err:.3e} < {EPS_STRICT:.1e}")
    elif os.path.exists(marker):
        os.remove(marker)
    print(f"CO2 production-path 25-condition max err = {err:.3e} "
          f"({n_lines} lines, worst at T={cond[0]} P={cond[1]})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
