"""Generate a physically-derived H2O line list for the O2 A-band window
(12850-13230 cm^-1) in HITRAN .par format, merged into data/hitran/H2O.par.

Air-gapped environment (no HITRAN download; the reference ships no .par
artifacts — its Artifacts.toml points at a remote mirror, ref:
/root/reference/src/Artifacts/download_hitran.jl:1-48), so in-band H2O
absorption — real and non-negligible for A-band retrievals — is computed
from first principles, the same approach as tools/make_o2_aband_linelist.py
for O2 (an asymmetric top needs numerics where O2 needed closed forms).

Physics:
  * Rotational eigenstates: Watson A-reduced effective Hamiltonian in the
    |J,k> symmetric-top basis (I^r representation, z = a axis),
    diagonalized per J with numpy.  Ground-state constants are REFINED by
    least squares against a table of published (000) term values
    (Flaud & Camy-Peyret / IUPAC compilations) embedded below — the fit
    gate keeps the (000) levels within ~0.2 cm^-1 up to J = 8.
  * Upper vibrational states: published band origins; rotational constants
    extrapolated linearly in the vibrational quanta from the published
    (100)/(010)/(001) constants (alpha constants).  High-quanta stretch
    states bend this linearity — see ACCURACY BUDGET.
  * Line strengths: exact rigid-rotor direction-cosine strengths computed
    from the eigenvectors with Wigner 3j symbols (a-type bands for odd
    Delta-v3 = b2 vibrations, b-type for a1), Boltzmann factors from the
    computed term values, ortho/para nuclear-spin weights (3/1, lower
    state Ka+Kc parity), normalized per band to published integrated band
    intensities.
  * Bands whose P/R lines reach the window:
      0.72 um polyad (P branches):  (301) 13830.94, (202) 13828.28,
                                    (103) 13808.27  cm^-1
      0.82 um polyad (R branches):  (211) 12151.25, (112) 12565.01 cm^-1
  * Air widths: J-dependent fit to the published H2O air-broadening scale
    gamma_air(J) = 0.039 + 0.059 exp(-J/7.6) cm^-1/atm; n_air = 0.68,
    delta_air = -0.010, gamma_self = 5.1 * gamma_air.

ACCURACY BUDGET (pinned by tests/test_flagship.py::test_h2o_accuracy_budget):
  * ground-state term values: fit residual < 0.2 cm^-1 for J <= 8 (gated
    in-tool); E'' in the .par is exact to that level.
  * line positions: dominated by the UPPER-state constants (linear alpha
    extrapolation to 3-4 quanta): ~0.5 cm^-1 at low Ka' growing to a few
    cm^-1 at Ka' >= 4. Positions are physical, not line-exact: windows
    containing an H2O line are correct to ~1 grid neighborhood, individual
    line centers may sit a few channels off the measured ones.
  * intensities: direction-cosine rotational strengths are exact for a
    rigid rotor; band normalization from published integrated intensities
    is good to ~+-40% (and vibration-rotation interaction redistributes
    a few % among branches). In-band H2O optical depth is ~1e-3 of the O2
    A-band peaks, so the worst-case flagship radiance effect of a 40%
    band-strength error is < 0.1% — bounded by the budget test.
  * widths: +-10% -> sub-percent radiance effects at these line depths.

Output: the window lines APPENDED to data/hitran/H2O.par (mol=1, iso=1
H2O-161 only; heavier isotopologues are < 3e-3 of the band strength and
below the budget floor), resorted by wavenumber.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsmartmom.scattering.wigner import wigner3j  # noqa: E402

C2 = 1.4387769          # cm K (second radiation constant)
T_REF = 296.0

# --- published (000) term values (cm^-1), J <= 8, Flaud & Camy-Peyret ------
# (J, Ka, Kc): E.  Used to refine A, B, C + quartic distortion constants.
GROUND_LEVELS = {
    (1, 0, 1): 23.794, (1, 1, 1): 37.137, (1, 1, 0): 42.372,
    (2, 0, 2): 70.091, (2, 1, 2): 79.496, (2, 1, 1): 95.176,
    (2, 2, 1): 134.902, (2, 2, 0): 136.164,
    (3, 0, 3): 136.762, (3, 1, 3): 142.279, (3, 1, 2): 173.366,
    (3, 2, 2): 206.301, (3, 2, 1): 212.156, (3, 3, 1): 285.219,
    (3, 3, 0): 285.419,
    (4, 0, 4): 222.053, (4, 1, 4): 224.838, (4, 1, 3): 275.497,
    (4, 2, 3): 300.362, (4, 2, 2): 315.780, (4, 3, 2): 382.517,
    (4, 3, 1): 383.843, (4, 4, 1): 488.108, (4, 4, 0): 488.134,
    (5, 0, 5): 325.348, (5, 1, 5): 326.625, (5, 1, 4): 399.458,
    (5, 2, 4): 416.209, (5, 2, 3): 446.511, (5, 3, 3): 503.968,
    (5, 3, 2): 508.812, (5, 4, 2): 610.114, (5, 4, 1): 610.341,
    (6, 0, 6): 446.697, (6, 1, 6): 447.252, (6, 1, 5): 542.906,
    (6, 2, 5): 552.911, (6, 2, 4): 602.774,
    (7, 0, 7): 586.244, (7, 1, 7): 586.479,
    (8, 0, 8): 744.064, (8, 1, 8): 744.164,
}

# seed rotational constants (cm^-1), (000)
A0, B0, C0 = 27.8806, 14.5216, 9.2778
# vibrational dependence (alpha; constants of (100)/(010)/(001))
ALPHA = {                                # (dA, dB, dC) per quantum
    "v1": (27.8806 - 27.13, 14.5216 - 14.30, 9.2778 - 9.10),
    "v2": (27.8806 - 31.07, 14.5216 - 14.67, 9.2778 - 9.14),
    "v3": (27.8806 - 26.63, 14.5216 - 14.43, 9.2778 - 9.14),
}

# bands: (v1,v2,v3) -> (origin cm^-1, integrated S296 cm^-1/(molec cm^-2),
#                       type)  [a-type for odd v3' = b2, b-type for a1]
BANDS = {
    (2, 1, 1): (12151.25, 3.3e-22, "a"),
    (1, 1, 2): (12565.01, 6.0e-23, "b"),
    (3, 0, 1): (13830.94, 2.4e-22, "a"),
    (2, 0, 2): (13828.28, 1.1e-22, "b"),
    (1, 0, 3): (13808.27, 4.0e-23, "a"),
}

WINDOW = (12850.0, 13230.0)
J_MAX = 12


def watson_hamiltonian(J, p):
    """Watson A-reduced Hamiltonian matrix in |J,k>, k = -J..J (I^r, z=a).

    p = (A, B, C, DJ, DJK, DK, dJ, dK)."""
    A, B, C, DJ, DJK, DK, dJ, dK = p
    k = np.arange(-J, J + 1, dtype=float)
    jj = float(J * (J + 1))
    H = np.zeros((2 * J + 1, 2 * J + 1))
    diag = (0.5 * (B + C) * (jj - k * k) + A * k * k
            - DJ * jj * jj - DJK * jj * k * k - DK * k ** 4)
    H[np.arange(2 * J + 1), np.arange(2 * J + 1)] = diag

    def fplus(kk):      # <k+1|J+|k> ladder factor sqrt(J(J+1)-k(k+1))
        return np.sqrt(np.maximum(jj - kk * (kk + 1.0), 0.0))

    for i, kk in enumerate(k[:-2]):
        f2 = fplus(kk) * fplus(kk + 1.0)
        off = (0.25 * (B - C) - 0.5 * dJ * jj
               - 0.25 * dK * (kk ** 2 + (kk + 2.0) ** 2)) * f2
        H[i + 2, i] = off
        H[i, i + 2] = off
    return H


def rot_levels(J, p):
    """Eigen-decomposition; returns (E sorted ascending, eigvec columns,
    (Ka, Kc) assignments by the standard energy ladder)."""
    w, v = np.linalg.eigh(watson_hamiltonian(J, p))
    kakc = [((i + 1) // 2, J - i // 2) for i in range(2 * J + 1)]
    return w, v, kakc


def fit_ground_constants():
    """Refine (A,B,C,quartics) against GROUND_LEVELS by Gauss-Newton."""
    p = np.array([A0, B0, C0, 1e-3, 0.0, 2e-2, 0.0, 0.0])

    keys = sorted(GROUND_LEVELS)
    target = np.array([GROUND_LEVELS[k] for k in keys])

    def model(p):
        out = []
        byJ = {}
        for (J, Ka, Kc) in keys:
            if J not in byJ:
                byJ[J] = rot_levels(J, p)
            w, _, kakc = byJ[J]
            out.append(w[kakc.index((Ka, Kc))])
        return np.array(out)

    for _ in range(30):
        r = model(p) - target
        Jac = np.zeros((len(r), len(p)))
        for j in range(len(p)):
            dp = np.zeros(len(p))
            dp[j] = max(1e-6, abs(p[j]) * 1e-5)
            Jac[:, j] = (model(p + dp) - model(p)) / dp[j]
        step, *_ = np.linalg.lstsq(Jac, -r, rcond=None)
        p = p + step
        if np.abs(step).max() < 1e-10:
            break
    resid = np.abs(model(p) - target).max()
    assert resid < 0.2, f"(000) level fit residual {resid:.3f} cm-1"
    return p, resid


def upper_constants(p_ground, v):
    """Linear alpha extrapolation of A,B,C; quartics kept at ground."""
    p = p_ground.copy()
    for q, name in zip(v, ("v1", "v2", "v3")):
        for i in range(3):
            p[i] -= q * ALPHA[name][i]
    return p


def line_strengths(J_low, v_low, kakc_low, J_up, v_up, kakc_up, btype):
    """Direction-cosine line strengths S(up <- low), exact for the rigid
    eigenvectors: S = (2J+1)(2J'+1) |sum_kq mu_q c'_{k+q} c_k 3j|^2.

    mu components about z=a: a-type = q=0; b-type = (q=-1) - (q=+1) (real
    combination; global normalization irrelevant — bands are renormalized
    to published integrated intensities)."""
    qs_mu = [(0, 1.0)] if not btype else [(-1, 1.0), (+1, -1.0)]
    ks_low = np.arange(-J_low, J_low + 1)
    S = np.zeros((2 * J_up + 1, 2 * J_low + 1))
    # precompute 3j(J' 1 J; -(k+q) q k) for all k, q
    tj = {}
    for q, _w in qs_mu:
        for k in ks_low:
            kp = k + q
            if abs(kp) <= J_up:
                tj[(q, k)] = wigner3j(J_up, 1, J_low, -kp, q, k)
    for iu in range(2 * J_up + 1):
        cu = v_up[:, iu]
        for il in range(2 * J_low + 1):
            cl = v_low[:, il]
            amp = 0.0
            for q, wmu in qs_mu:
                for ik, k in enumerate(ks_low):
                    kp = k + q
                    if abs(kp) <= J_up:
                        amp += (wmu * cl[ik] * cu[kp + J_up]
                                * (-1.0) ** (k + q) * tj[(q, k)])
            S[iu, il] = (2 * J_low + 1) * (2 * J_up + 1) * amp * amp
    return S


def gamma_air_fit(J):
    return 0.039 + 0.059 * np.exp(-np.asarray(J, float) / 7.6)


def g_ns(Ka, Kc):
    """Ortho (3) / para (1) weight of a (000)-state rotational level."""
    return 3.0 if (Ka + Kc) % 2 == 1 else 1.0


def build_lines():
    p_g, resid = fit_ground_constants()
    print(f"(000) constants refined: max residual {resid:.3f} cm-1")

    # ground-state levels/vectors per J
    ground = {J: rot_levels(J, p_g) for J in range(0, J_MAX + 2)}

    rows = []   # (nu, S, E'', J'', Ka'', Kc'', J', Ka', Kc', band)
    for v, (nu0, s_band, btype) in BANDS.items():
        p_u = upper_constants(p_g, v)
        upper = {J: rot_levels(J, p_u) for J in range(0, J_MAX + 2)}
        band_rows = []
        for J in range(0, J_MAX + 1):
            wl, vl, kakc_l = ground[J]
            for Jp in (J - 1, J, J + 1):
                if Jp < 0:
                    continue
                wu, vu, kakc_u = upper[Jp]
                S = line_strengths(J, vl, kakc_l, Jp, vu, kakc_u,
                                   btype == "b")
                for iu in range(2 * Jp + 1):
                    for il in range(2 * J + 1):
                        if S[iu, il] < 1e-10:
                            continue
                        nu = nu0 + wu[iu] - wl[il]
                        kal, kcl = kakc_l[il]
                        kau, kcu = kakc_u[iu]
                        band_rows.append(
                            (nu, S[iu, il], wl[il], J, kal, kcl,
                             Jp, kau, kcu))
        # Boltzmann + stimulated emission + spin weights; normalize the
        # FULL band to s_band, then keep the window
        br = np.array([(r[0], r[1], r[2]) for r in band_rows])
        gns = np.array([g_ns(r[4], r[5]) for r in band_rows])
        w = (br[:, 1] * gns * np.exp(-C2 * br[:, 2] / T_REF)
             * (1.0 - np.exp(-C2 * br[:, 0] / T_REF)))
        s_line = s_band * w / w.sum()
        for r, s in zip(band_rows, s_line):
            if WINDOW[0] <= r[0] <= WINDOW[1] and s > 1e-29:
                rows.append(r[:1] + (s,) + r[2:] + (v,))
    return rows


def format_par(rows):
    """HITRAN2004 160-char records, mol=1 (H2O), iso=1."""
    recs = []
    for (nu, s, elow, J, ka, kc, Jp, kap, kcp, v) in rows:
        g_air = float(gamma_air_fit(J))
        vib_u = f"{v[0]:d} {v[1]:d} {v[2]:d}"
        quanta_gu = f"{vib_u:>15s}"
        quanta_gl = f"{'0 0 0':>15s}"
        lq_u = f"{Jp:3d}{kap:3d}{kcp:3d}      "       # 15-char local upper
        lq_l = f"{J:3d}{ka:3d}{kc:3d}      "
        rec = (f"{1:2d}" + "1"
               + f"{nu:12.6f}"
               + f"{s:10.3E}"
               + f"{1.0e-3:10.3E}"
               + f"{g_air:5.3f}"[:5]
               + f"{5.1 * g_air:5.3f}"[:5]
               + f"{elow:10.4f}"
               + f"{0.68:4.2f}"
               + f"{-0.010:8.5f}"[:8]
               + quanta_gu + quanta_gl + lq_u + lq_l
               + " 0 0 0" + " " * 12 + " "
               + f"{2.0 * Jp + 1.0:7.1f}" + f"{2.0 * J + 1.0:7.1f}")
        assert len(rec) == 160, (len(rec), rec)
        recs.append(rec)
    return recs


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "..", "data", "hitran", "H2O.par")
    rows = build_lines()
    rows.sort(key=lambda r: r[0])
    recs = format_par(rows)

    existing = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = [ln.rstrip("\n") for ln in f if ln.strip()]
        # drop any previous generation of this window (idempotent rebuild)
        existing = [ln for ln in existing
                    if not (WINDOW[0] <= float(ln[3:15]) <= WINDOW[1])]
    merged = existing + recs
    merged.sort(key=lambda ln: float(ln[3:15]))
    with open(out_path, "w") as f:
        f.write("\n".join(merged) + "\n")
    nu = np.array([r[0] for r in rows])
    s = np.array([r[1] for r in rows])
    print(f"wrote {len(rows)} H2O window lines "
          f"({nu.min():.2f}-{nu.max():.2f} cm-1, S {s.min():.2e}-"
          f"{s.max():.2e}, sum {s.sum():.3e}) into {out_path} "
          f"({len(merged)} total records)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
