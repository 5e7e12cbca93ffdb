"""Window-focused Levenberg-Marquardt polish for the line-list fits.

The global matching-pursuit sweep of fit_linelist.py stalls near 1e-24 on
CO2: its fixed 1.5 cm^-1 chunks and 6 LM iterations cannot untangle
blended multiplets. This pass instead (1) locates every spectral interval
whose residual exceeds the target, (2) runs a deep LM (hundreds of
iterations) on all lines in the interval against all 25 conditions, and
(3) splits the locally-worst line into a doublet when LM stalls — the
strategy that closed the H2O fit to 3.7e-28.

State is saved after every improving window, so the run is resumable.

Usage: python tools/polish_windows.py CO2 [--target=2.4e-27] [--hours=2]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from fit_linelist import (GRID, LineSet, STATE_DIR, load_conditions,  # noqa
                          synth_full, window_model_jac, init_line)


def bad_windows(resid, target, pad=0.35, min_gap=0.8):
    """Merge over-target grid points into [lo_nu, hi_nu] intervals."""
    bad = np.abs(resid).max(axis=0) > target
    idx = np.where(bad)[0]
    if len(idx) == 0:
        return []
    nus = GRID[idx]
    out = []
    lo = hi = nus[0]
    for x in nus[1:]:
        if x - hi <= min_gap:
            hi = x
        else:
            out.append((lo - pad, hi + pad))
            lo = hi = x
    out.append((lo - pad, hi + pad))
    return out


def lm_window(ls, conds, Y, M, a, b, iters=250, gpad=2.0):
    """Deep LM on all lines in [a, b); returns (improved, window_resid)."""
    idx = np.where((ls.theta[:, 0] >= a) & (ls.theta[:, 0] < b))[0]
    g_lo = np.searchsorted(GRID, a - gpad)
    g_hi = np.searchsorted(GRID, b + gpad, side="right")
    g = GRID[g_lo:g_hi]
    if len(idx) == 0:
        return False, float(np.abs(Y[:, g_lo:g_hi] - M[:, g_lo:g_hi]).max())
    m0, _ = window_model_jac(ls, idx, conds, g)
    data = Y[:, g_lo:g_hi] - (M[:, g_lo:g_hi] - m0)

    lm = 1e-6
    prev = None
    best = ls.theta[idx].copy()
    best_cost = np.inf
    stall = 0
    for it in range(iters):
        m, jac = window_model_jac(ls, idx, conds, g)
        r = (data - m).ravel()
        cost = float(r @ r)
        if cost < best_cost * (1.0 - 1e-9):
            best_cost, best = cost, ls.theta[idx].copy()
            stall = 0
        else:
            stall += 1
        if prev is None or cost <= prev:
            prev = cost
            lm = max(lm * 0.5, 1e-10)
        else:
            ls.theta[idx] = best
            lm *= 8.0
            m, jac = window_model_jac(ls, idx, conds, g)
            r = (data - m).ravel()
        if stall > 25:
            break
        J = jac.reshape(len(r), len(idx) * 6)
        s = np.sqrt((J * J).sum(axis=0)) + 1e-300
        Jn = J / s
        A = Jn.T @ Jn + lm * np.eye(Jn.shape[1])
        try:
            step = np.linalg.solve(A, Jn.T @ r) / s
        except np.linalg.LinAlgError:
            break
        th = ls.theta[idx] + step.reshape(len(idx), 6)
        th[:, 1] = np.clip(th[:, 1], np.log(1e-31), np.log(1e-18))
        th[:, 2] = np.clip(th[:, 2], 0.0, 4500.0)
        th[:, 3] = np.clip(th[:, 3], np.log(0.005), np.log(0.3))
        th[:, 4] = np.clip(th[:, 4], -0.5, 1.2)
        th[:, 5] = np.clip(th[:, 5], -0.05, 0.05)
        ls.theta[idx] = th
    ls.theta[idx] = best
    m, _ = window_model_jac(ls, idx, conds, g)
    M[:, g_lo:g_hi] += m - m0
    wres = float(np.abs(Y[:, g_lo:g_hi] - M[:, g_lo:g_hi]).max())
    return True, wres


def split_worst(ls, conds, Y, M, a, b, target):
    """Add a line at the worst residual peak inside [a, b); M is updated
    in place with the new line's contribution (no full re-synthesis)."""
    g_lo = np.searchsorted(GRID, a)
    g_hi = np.searchsorted(GRID, b, side="right")
    resid = Y[:, g_lo:g_hi] - M[:, g_lo:g_hi]
    j = int(np.abs(resid).max(axis=0).argmax())
    nu_pk = GRID[g_lo + j]
    full_resid = Y - M
    row = init_line(ls.molecule, float(nu_pk), full_resid, conds,
                    ls.weight, ls.mol_id)
    if row is None:
        # seed from the nearest existing line, shifted to the peak
        k = int(np.abs(ls.theta[:, 0] - nu_pk).argmin())
        row = ls.theta[k].copy()
        row[0] = nu_pk
        row[1] = max(row[1] - 3.0, np.log(1e-30))
    row = np.asarray(row).ravel()
    ls.add(np.atleast_2d(row))
    # add only the new line's profile to M (its 40 cm^-1 wing window)
    sub = LineSet(ls.molecule)
    sub.theta = row[None]
    w_lo = np.searchsorted(GRID, row[0] - 41.0)
    w_hi = np.searchsorted(GRID, row[0] + 41.0, side="right")
    shift = synth_full(sub, conds)
    M[:, w_lo:w_hi] += shift[:, w_lo:w_hi]


def main(molecule, target, hours, outer=6):
    conds, Y = load_conditions(molecule)
    ls = LineSet(molecule)
    path = os.path.join(STATE_DIR, f"{molecule}_fit.npz")
    ls.load(path)
    t_end = time.time() + hours * 3600.0
    for rnd in range(outer):
        M = synth_full(ls, conds)
        g_res = float(np.abs(Y - M).max())
        wins = bad_windows(Y - M, target)
        print(f"[{molecule}] polish round {rnd}: {ls.n} lines, "
              f"max|resid| = {g_res:.3e}, {len(wins)} bad windows",
              flush=True)
        if g_res < target or not wins:
            break
        # worst windows first
        order = sorted(wins, key=lambda w: -float(
            np.abs(Y[:, np.searchsorted(GRID, w[0]):
                       np.searchsorted(GRID, w[1], side='right')]
                   - M[:, np.searchsorted(GRID, w[0]):
                        np.searchsorted(GRID, w[1], side='right')]).max()))
        for wi, (a, b) in enumerate(order):
            if time.time() > t_end:
                print(f"[{molecule}] time budget reached", flush=True)
                ls.save(path)
                return
            _, wres = lm_window(ls, conds, Y, M, a, b)
            tries = 0
            while wres > target and tries < 4:
                split_worst(ls, conds, Y, M, a, b, target)
                _, wres = lm_window(ls, conds, Y, M, a, b)
                tries += 1
            if wi % 20 == 0:
                print(f"[{molecule}]   window {wi}/{len(order)} "
                      f"[{a:.2f},{b:.2f}] -> {wres:.2e} "
                      f"({ls.n} lines)", flush=True)
                ls.save(path)
        ls.save(path)
    M = synth_full(ls, conds)
    print(f"[{molecule}] final: {ls.n} lines, "
          f"max|resid| = {np.abs(Y - M).max():.3e}", flush=True)
    ls.save(path)


if __name__ == "__main__":
    mol = sys.argv[1] if len(sys.argv) > 1 else "CO2"
    target = 2.4e-27
    hours = 2.0
    for a in sys.argv[2:]:
        if a.startswith("--target="):
            target = float(a.split("=")[1])
        if a.startswith("--hours="):
            hours = float(a.split("=")[1])
    main(mol, target, hours)
