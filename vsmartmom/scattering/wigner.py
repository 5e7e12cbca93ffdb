"""Wigner 3-j symbol tables for the PCW (Domke) Mie decomposition.

The reference builds its tables with memoized scalar recursions from
Sanghavi 2014 eqs. 25-31 (ref: src/Scattering/compute_wigner_values.jl).
Here we instead use the standard three-term recurrence in j1 (Schulten &
Gordon 1975; Luscombe & Luban 1998): for fixed (j2, j3, m1, m2, m3) the
entire row f(j1), j1 = jmin..jmax, satisfies

    j A(j+1) f(j+1) + B(j) f(j) + (j+1) A(j) f(j-1) = 0
    A(j) = sqrt[(j^2-(j2-j3)^2)((j2+j3+1)^2-j^2)(j^2-m1^2)]
    B(j) = -(2j+1)[ j2(j2+1) m1 - j3(j3+1) m1 - j(j+1)(m3-m2) ]

with A(jmin) = A(jmax+1) = 0, normalization sum_j (2j+1) f(j)^2 = 1 and
sign(f(jmax)) = (-1)^(j2-j3+m2-m3). We run the recursion forward from jmin
and backward from jmax, match the branches where both are healthy, then
normalize — and the whole table builder is vectorized across every
(j2, j3) row at once (one global sweep over j), which is what makes
full-size production tables (N_max ~ several hundred) build in seconds.

Needed configurations (m1, m2, m3): (-1, 1, 0) -> table A,
(-1, -1, 2) -> table B, (0, 0, 0) (used only via scalar calls in tests).
"""
from __future__ import annotations

import numpy as np


def _row_coeffs(j, j2, j3, m1, m2, m3):
    """A(j), B(j) of the three-term recurrence, vectorized over j and rows."""
    with np.errstate(invalid="ignore"):
        a = np.sqrt(np.maximum(
            (j**2 - (j2 - j3) ** 2).astype(np.float64)
            * ((j2 + j3 + 1) ** 2 - j**2)
            * (j**2 - m1**2), 0.0))
    b = -(2.0 * j + 1.0) * (j2 * (j2 + 1.0) * m1 - j3 * (j3 + 1.0) * m1
                            - j * (j + 1.0) * (m3 - m2))
    return a, b


def wigner3j_row(j2: int, j3: int, m1: int, m2: int, m3: int):
    """All w3j(j1, j2, j3; m1, m2, m3) for j1 = jmin..jmax.

    Returns (jmin, values). Thin scalar wrapper over the vectorized
    row solver (used by tests and the scalar `wigner3j`).
    """
    rows = _solve_rows(np.array([j2]), np.array([j3]), m1, m2, m3)
    jmin = max(abs(j2 - j3), abs(m1))
    return jmin, rows[0, jmin:j2 + j3 + 1]


def wigner3j(j1, j2, j3, m1, m2, m3) -> float:
    """Scalar Wigner 3-j symbol for the supported m-configurations
    (any (m1, m2, m3) with m1 + m2 + m3 = 0)."""
    if m1 + m2 + m3 != 0:
        return 0.0
    jmin = max(abs(j2 - j3), abs(m1))
    if j1 < jmin or j1 > j2 + j3 or abs(m2) > j2 or abs(m3) > j3:
        return 0.0
    jm, row = wigner3j_row(j2, j3, m1, m2, m3)
    return float(row[j1 - jm])


def _solve_rows(j2s, j3s, m1, m2, m3):
    """Vectorized row solver: w3j(j1, j2s[r], j3s[r]; m1, m2, m3) for every
    row r and j1 = 0..max(j2+j3). Returns (n_rows, jmax_global+1); entries
    outside [jmin, jmax] of a row are 0.
    """
    j2s = np.asarray(j2s, dtype=np.int64)[:, None]     # (R, 1)
    j3s = np.asarray(j3s, dtype=np.int64)[:, None]
    n_rows = j2s.shape[0]
    jmins = np.maximum(np.abs(j2s - j3s), abs(m1))     # (R, 1)
    jmaxs = j2s + j3s
    L = int(jmaxs.max()) + 1
    js = np.arange(L + 1, dtype=np.int64)[None, :]     # (1, L+1)

    a, b = _row_coeffs(js.astype(np.float64), j2s, j3s,
                       float(m1), float(m2), float(m3))   # (R, L+1)

    in_range = (js[:, :L] >= jmins) & (js[:, :L] <= jmaxs)

    # --- forward branch: seed f(jmin) = 1, f(jmin+1) from the jmin relation
    ff = np.zeros((n_rows, L))
    np.put_along_axis(ff, jmins, 1.0, axis=1)
    # f(jmin+1) = -B(jmin)/(jmin*A(jmin+1)); rows with jmin == 0 are
    # degenerate (B(0) = 0): leave the forward branch as a delta and rely on
    # the backward branch there.
    jm_f = jmins.astype(np.float64)
    b_at = np.take_along_axis(b, jmins, axis=1)
    a_at1 = np.take_along_axis(a, np.minimum(jmins + 1, L), axis=1)
    denom = jm_f * a_at1
    seed1 = -b_at / np.where(denom == 0, 1.0, denom)
    ridx = np.arange(n_rows)
    ok = (denom[:, 0] != 0) & (jmins[:, 0] + 1 <= jmaxs[:, 0])
    ff[ridx[ok], jmins[ok, 0] + 1] = seed1[ok, 0]
    fwd_ok = jmins[:, 0] > 0

    # Global forward sweep: f(j+1) = -(B(j) f(j) + (j+1) A(j) f(j-1)) / (j A(j+1))
    for j in range(1, L - 1):
        active = (j >= jmins[:, 0] + 1) & (j <= jmaxs[:, 0] - 1)
        denom = j * a[:, j + 1]
        with np.errstate(invalid="ignore", divide="ignore"):
            nxt = -(b[:, j] * ff[:, j] + (j + 1) * a[:, j] * ff[:, j - 1]) \
                / np.where(denom == 0, 1.0, denom)
        ff[:, j + 1] = np.where(active & (denom != 0), nxt, ff[:, j + 1])
        # overflow guard: rescale the whole forward row
        big = np.abs(ff[:, j + 1]) > 1e250
        if big.any():
            ff[big] *= 1e-250

    # --- backward branch: seed f(jmax) = 1, f(jmax-1) from the jmax relation
    fb = np.zeros((n_rows, L))
    np.put_along_axis(fb, jmaxs, 1.0, axis=1)
    jx_f = jmaxs.astype(np.float64)
    b_at = np.take_along_axis(b, jmaxs, axis=1)
    a_at = np.take_along_axis(a, jmaxs, axis=1)
    denom = (jx_f + 1.0) * a_at
    seedm1 = -b_at / np.where(denom == 0, 1.0, denom)
    okb = (denom[:, 0] != 0) & (jmaxs[:, 0] - 1 >= jmins[:, 0])
    fb[ridx[okb], jmaxs[okb, 0] - 1] = seedm1[okb, 0]

    # Global backward sweep: f(j-1) = -(j A(j+1) f(j+1) + B(j) f(j)) / ((j+1) A(j))
    for j in range(L - 2, 0, -1):
        active = (j - 1 >= jmins[:, 0]) & (j <= jmaxs[:, 0] - 1)
        denom = (j + 1) * a[:, j]
        with np.errstate(invalid="ignore", divide="ignore"):
            prv = -(j * a[:, j + 1] * fb[:, j + 1] + b[:, j] * fb[:, j]) \
                / np.where(denom == 0, 1.0, denom)
        fb[:, j - 1] = np.where(active & (denom != 0), prv, fb[:, j - 1])
        big = np.abs(fb[:, j - 1]) > 1e250
        if big.any():
            fb[big] *= 1e-250

    # --- match branches at the per-row argmax of |ff * fb| -----------------
    prod = np.abs(ff * fb)
    prod[~in_range] = -1.0
    jc = np.argmax(prod, axis=1)[:, None]              # (R, 1)
    fb_c = np.take_along_axis(fb, jc, axis=1)
    ff_c = np.take_along_axis(ff, jc, axis=1)
    good = (np.abs(ff_c) > 0) & fwd_ok[:, None]
    scale = np.where(good, fb_c / np.where(ff_c == 0, 1.0, ff_c), 1.0)
    use_fwd = good & (js[:, :L] < jc)
    f = np.where(use_fwd, ff * scale, fb)
    f = np.where(in_range, f, 0.0)

    # --- normalize + fix sign ---------------------------------------------
    norm = np.sum((2.0 * js[:, :L] + 1.0) * f * f, axis=1, keepdims=True)
    f = f / np.sqrt(norm)
    sgn_target = np.where((j2s - j3s + m2 - m3) % 2 == 0, 1.0, -1.0)
    f_last = np.take_along_axis(f, jmaxs, axis=1)
    flip = np.where(np.sign(f_last) * sgn_target < 0, -1.0, 1.0)
    return f * flip


def compute_wigner_values(m_max: int, n_max: int = None, l_max: int = None):
    """Tables A[m-1, n-1, l] = w3j(m, n, l; -1, 1, 0) and
    B[m-1, n-1, l] = w3j(m, n, l; -1, -1, 2) for m = 1..m_max, n = 1..n_max,
    l = 0..l_max-1 (ref: compute_wigner_values.jl:190-222; same table
    semantics, 0-based l index = degree).

    Called with a single argument N_max, uses the reference's shorthand
    sizes (2 N_max + 1, N_max + 1, 2 N_max + 1).
    """
    if n_max is None:
        n_max = m_max + 1
        m_max, l_max = 2 * m_max + 1, 2 * m_max + 1

    tab_a = np.zeros((m_max, n_max, l_max))
    tab_b = np.zeros((m_max, n_max, l_max))

    # One row per (n, l) pair; each row spans all m at once. Chunk over l
    # blocks to bound peak memory for production-size tables
    # (N_max ~ 400 -> ~300k rows x ~1100 cols).
    l_chunk = max(1, int(2e7 // (n_max * (n_max + l_max))))
    for l0 in range(0, l_max, l_chunk):
        l1 = min(l0 + l_chunk, l_max)
        ns, ls = np.meshgrid(np.arange(1, n_max + 1), np.arange(l0, l1),
                             indexing="ij")
        ns, ls = ns.ravel(), ls.ravel()
        for cfg, tab in (((-1, 1, 0), tab_a), ((-1, -1, 2), tab_b)):
            rows = _solve_rows(ns, ls, *cfg)
            width = min(m_max, rows.shape[1] - 1)
            tab[:width, :, l0:l1] = rows[:, 1:width + 1].reshape(
                n_max, l1 - l0, -1).transpose(2, 0, 1)

    # (-1,-1,2) requires j3 >= 2; _solve_rows handles m3 > j3 rows through
    # the triangle mask, but zero them explicitly for safety.
    tab_b[:, :, :2] = 0.0
    return tab_a, tab_b


def save_wigner_values(filepath: str, wigner_A, wigner_B):
    """Cache tables to disk (ref: compute_wigner_values.jl:224-229)."""
    np.savez_compressed(filepath, wigner_A=wigner_A, wigner_B=wigner_B)


def load_wigner_values(filepath: str):
    with np.load(filepath) as z:
        return z["wigner_A"], z["wigner_B"]
