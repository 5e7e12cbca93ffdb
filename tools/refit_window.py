"""Targeted re-centered refit for STUCK line-list windows.

polish_windows.py sweeps all over-target windows; its chop boundaries and
incremental seeding can leave a handful of windows stuck for rounds (the
round-4/5 CO2 global max sat at 1.48e-24 across rounds, pinned at
~6358.66 cm^-1 with 50+ bound-saturated lines). This tool attacks ONE
window, centered exactly on the worst residual point, with two
strategies and keeps the better outcome:

  polish — deep LM on the existing core lines (bigger budgets than the
           sweep: more iterations, more splits);
  fresh  — DROP the window's core lines and re-seed from the residual
           against the frozen-pad background (escapes the over-seeded
           local minimum the incremental path dug itself into).

A merge is accepted only if the window residual improves AND the global
25-condition max does not regress (full synth re-validation, not just
the wide-slice guard).

Usage: python tools/refit_window.py CO2 [nu_center] [--half=0.5]
       [--iters=400] [--target=2.4e-27] [--fresh-only]
       (no nu_center: pick the global-max location)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from fit_linelist import (GRID, LineSet, STATE_DIR,  # noqa: E402
                          load_conditions, synth_full, window_model_jac)
from polish_windows import GPAD, PAD, WING, _model_only, lm_core  # noqa: E402


def refit(molecule, nu_center, half, target, iters, fresh_only=False,
          save=True):
    conds, Y = load_conditions(molecule)
    ls = LineSet(molecule)
    path = os.path.join(STATE_DIR, f"{molecule}_fit.npz")
    ls.load(path)

    M = synth_full(ls, conds)
    g_res0 = float(np.abs(Y - M).max())
    if nu_center is None:
        nu_center = float(GRID[int(np.argmax(np.abs(Y - M).max(axis=0)))])
    a, b = nu_center - half, nu_center + half
    print(f"[{molecule}] refit window [{a:.3f}, {b:.3f}) "
          f"(global max {g_res0:.3e})", flush=True)

    nu_all = ls.theta[:, 0]
    sel = (nu_all >= a - PAD) & (nu_all < b + PAD)
    idx_all = np.where(sel)[0]
    g_lo = np.searchsorted(GRID, a - PAD - GPAD)
    g_hi = np.searchsorted(GRID, b + PAD + GPAD, side="right")
    g = GRID[g_lo:g_hi]
    if len(idx_all):
        m0, _ = window_model_jac(ls, idx_all, conds, g)
    else:
        m0 = 0.0
    data = Y[:, g_lo:g_hi] - (M[:, g_lo:g_hi] - m0)

    theta_snap = ls.theta[idx_all]
    core_snap = (theta_snap[:, 0] >= a) & (theta_snap[:, 0] < b)
    pad_rows = theta_snap[~core_snap]
    m_pad = (_model_only(pad_rows, conds, g, molecule)
             if len(pad_rows) else np.zeros_like(data))
    data_c = data - m_pad

    core0 = theta_snap[core_snap]
    sub0 = LineSet(molecule)
    sub0.theta = core0.copy()
    if len(core0):
        mm0, _ = window_model_jac(sub0, np.arange(len(core0)), conds, g)
    else:
        mm0 = np.zeros_like(data_c)
    wres0 = float(np.abs(data_c - mm0).max())
    print(f"  {len(core0)} core lines, wres0 = {wres0:.3e}", flush=True)

    candidates = []
    if not fresh_only and len(core0):
        sub = LineSet(molecule)
        sub.theta = core0.copy()
        w = lm_core(sub, conds, data_c, g, a, b, target, iters=iters,
                    max_splits=20)
        candidates.append(("polish", w, sub.theta))
        print(f"  polish: {w:.3e} ({sub.n} lines)", flush=True)
    # fresh: empty core -> lm_core seeds from the residual itself
    sub = LineSet(molecule)
    sub.theta = np.zeros((0, 6))
    w = lm_core(sub, conds, data_c, g, a, b, target, iters=iters,
                max_splits=30)
    candidates.append(("fresh", w, sub.theta))
    print(f"  fresh:  {w:.3e} ({sub.n} lines)", flush=True)

    name, wres, theta_new = min(candidates, key=lambda c: c[1])
    if wres >= wres0:
        print(f"  no improvement ({wres:.3e} >= {wres0:.3e}); keeping",
              flush=True)
        return g_res0, g_res0

    # merge candidate: replace core rows; re-validate the FULL residual
    keep = np.ones(ls.n, bool)
    keep[idx_all[core_snap]] = False
    trial = LineSet(molecule)
    core_new = theta_new[(theta_new[:, 0] >= a) & (theta_new[:, 0] < b)]
    trial.theta = np.vstack([ls.theta[keep], core_new])
    order = np.argsort(trial.theta[:, 0])
    trial.theta = trial.theta[order]
    M1 = synth_full(trial, conds)
    g_res1 = float(np.abs(Y - M1).max())
    print(f"  {name}: window {wres0:.3e} -> {wres:.3e}; "
          f"global {g_res0:.3e} -> {g_res1:.3e}", flush=True)
    if g_res1 <= g_res0 and save:
        trial.save(path)
        print("  saved", flush=True)
        return g_res0, g_res1
    if g_res1 > g_res0:
        print("  global regressed; NOT saved", flush=True)
    return g_res0, g_res0


if __name__ == "__main__":
    mol = sys.argv[1] if len(sys.argv) > 1 else "CO2"
    nu_c, half, target, iters, fresh_only = None, 0.5, 2.4e-27, 400, False
    for arg in sys.argv[2:]:
        if arg.startswith("--half="):
            half = float(arg.split("=")[1])
        elif arg.startswith("--iters="):
            iters = int(arg.split("=")[1])
        elif arg.startswith("--target="):
            target = float(arg.split("=")[1])
        elif arg == "--fresh-only":
            fresh_only = True
        else:
            nu_c = float(arg)
    refit(mol, nu_c, half, target, iters, fresh_only)
