"""Generate a physically-derived O2 A-band line list in HITRAN .par format.

This environment is air-gapped (no HITRAN download, and the reference repo
ships no .par artifacts — its Artifacts.toml points at a remote mirror,
ref: /root/reference/Artifacts.toml, src/Artifacts/download_hitran.jl:1-48),
so the flagship O2 A-band pipeline needs a line list computed from first
principles. The b1Sigma_g+ (v'=0) <- X3Sigma_g- (v''=0) magnetic-dipole
band at ~13 122 cm^-1 is fully determined by published spectroscopic
constants; this is how the measured line lists were originally assembled.

Physics:
  * Lower-state term values: Schlapp (1937) expressions for the X3Sigma_g-
    spin triplet F1/F2/F3 (J = N+1, N, N-1) with rotational constants from
    Babcock & Herzberg (1948) / Rouille et al. (1992). For 16O2 only odd N
    exist (nuclear statistics, I = 0).
  * 16O18O isotopologue band (HITRAN iso=2, abundance 3.991e-3): same
    expressions with mass-scaled constants (B' = rho^2 B, D' = rho^4 D,
    rho^2 = mu(66)/mu(68) = 0.94434) and the band origin shifted by the
    zero-point-energy difference (+2.11 cm^-1). Heteronuclear, so ALL N
    exist (no parity alternation) — the ~8% extra line count of the real
    HITRAN A-band list.
  * Upper state b1Sigma_g+: simple 1Sigma rotor, J' = N'.
  * Branches (DeltaJ = 0,+-1; Q<-Q forbidden for Sigma+ <- Sigma-):
    PP(N): J''=N (F2); PQ(N): J''=N-1 (F3); RR(N): J''=N (F2);
    RQ(N): J''=N+1 (F1).
  * Intensities: degeneracy-weighted branch sharing (P/R share of the F2
    level as N / N+1; Q branches carry (2J''+1)/2), Boltzmann factors with
    the exact term values, normalized to the published A-band integrated
    intensity ~2.24e-22 cm^-1/(molec cm^-2) at 296 K (x natural abundance
    ratio for iso 2). These are *approximate* Honl-London weights (exact
    Watson 1968 factors differ at the few-% level within doublets) —
    positions, E'', and the band envelope are physical; swap in a real
    HITRAN O2.par for line-accurate work (drop it in data/hitran/).
  * Air widths: smooth N-dependent fit to the published A-band
    air-broadening scale (Brown & Plymate 2000 / HITRAN gamma_air column):
    gamma_air(N) = 0.0400 + 0.0210 exp(-N/20) cm^-1/atm (0.0605 at N=1
    down to 0.044 at N=33), n_air = 0.72, delta_air = -0.008 cm^-1/atm.

ACCURACY BUDGET (pinned by tests/test_flagship.py::test_o2_accuracy_budget):
  * line positions: B/D from Babcock-Herzberg are good to ~1e-3 cm^-1
    over N <= 40; the rounded band origin contributes a COMMON shift of
    up to ~1.1 cm^-1 (NU00 = 13122.0 vs the spectroscopic 13120.9).
    Individual line positions relative to the band are accurate to
    ~0.05 cm^-1. Effect on radiance: a rigid band shift only relabels
    the wavenumber axis; the ~0.05 cm^-1 relative scatter (> gamma_L)
    TRANSLATES saturated-line flanks — up to ~10% transmission error on
    the steep edges; the typical (median) channel moves ~2% (measured:
    max 0.095, median 0.022 on a two-way 800 hPa path, dense R branch).
  * intensities: the Honl-London approximation mis-shares doublet
    strength at the few-% level; band-integrated absorption is exact by
    construction (S_BAND normalization), so continuum-level radiances
    are unaffected and line-core radiances carry < 5% relative error.
  * widths: the gamma_air(N) fit is within ~3% of the published A-band
    values; fractional radiance error from a 3% width error is < 3% in
    line cores, < 0.5% in wings.

Output: data/hitran/O2.par (HITRAN2004 160-char records, mol=7,
iso=1 16O2 + iso=2 16O18O, sorted by wavenumber), readable by
vsmartmom.spectroscopy.hitran.read_hitran.
"""
import os
import sys

import numpy as np

C2 = 1.4387769          # second radiation constant [cm K]
T_REF = 296.0

# X3Sigma_g- (v=0) constants [cm^-1] (Babcock & Herzberg / Rouille et al.)
# and b1Sigma_g+ (v=0); band origin parameterized as b(J'=0) minus the
# hypothetical F2(N=0) level.
RHO2_68 = 0.94434       # mu(16O2)/mu(16O18O): B scaling of the heavy iso

ISO_CONST = {
    1: dict(B_X=1.4376766, D_X=4.842e-6, LAM=1.984751, GAM=-0.00842536,
            B_B=1.39125, D_B=5.36e-6, NU00=13122.0,
            abundance=0.995262, odd_only=True),
    # 16O18O: rho^2-scaled rotational constants; spin-spin LAM is
    # electronic (iso-independent); origin shifted by the ZPE difference
    # ((rho-1)(we_b - we_X)/2 - (rho^2-1)(wexe_b - wexe_X)/4 = +2.11)
    2: dict(B_X=1.4376766 * RHO2_68, D_X=4.842e-6 * RHO2_68 ** 2,
            LAM=1.984751, GAM=-0.00842536 * RHO2_68,
            B_B=1.39125 * RHO2_68, D_B=5.36e-6 * RHO2_68 ** 2,
            NU00=13122.0 + 2.11,
            abundance=0.00399141, odd_only=False),
}

S_BAND = 2.24e-22       # integrated band intensity at 296 K [cm^-1/(mc^-2)]
                        # (natural-abundance 16O2; iso 2 scales by ratio)


def term_X(N, c):
    """Schlapp (1937) term values of X3Sigma_g- F1/F2/F3."""
    B_X, D_X, LAM, GAM = c["B_X"], c["D_X"], c["LAM"], c["GAM"]
    x = N * (N + 1.0)
    f2 = B_X * x - D_X * x * x
    root_p = np.sqrt((2 * N + 3.0) ** 2 * B_X ** 2 + LAM ** 2
                     - 2.0 * LAM * B_X)
    root_m = np.sqrt((2 * N - 1.0) ** 2 * B_X ** 2 + LAM ** 2
                     - 2.0 * LAM * B_X)
    f1 = B_X * x + (2 * N + 3.0) * B_X - LAM - root_p + GAM * (N + 1.0) \
        - D_X * (x + 2 * N + 2.0) ** 2
    f3 = B_X * x - (2 * N - 1.0) * B_X - LAM + root_m - GAM * N \
        - D_X * (x - 2 * N) ** 2
    return f1, f2, f3      # J = N+1, N, N-1


def term_b(J, c):
    x = J * (J + 1.0)
    return c["NU00"] + c["B_B"] * x - c["D_B"] * x * x


def gamma_air_fit(J):
    """Smooth fit to the published O2 A-band air widths (Brown & Plymate
    2000 scale): 0.0605 cm^-1/atm at J=1 declining to ~0.044 at J=33."""
    return 0.0400 + 0.0210 * np.exp(-np.asarray(J, float) / 20.0)


def build_lines(iso=1, n_max=49):
    """Return line-parameter arrays for the four A-band branches."""
    c = ISO_CONST[iso]
    # energy zero = lowest existing level of THIS isotopologue
    n_lowest = 1.0
    e0 = term_X(np.array([n_lowest]), c)[2][0]

    step = 2 if c["odd_only"] else 1
    rows = []  # (nu, hl_weight, elow, jpp, branch)
    for N in range(1, n_max + 1, step):
        f1, f2, f3 = (t[0] for t in term_X(np.array([float(N)]), c))
        # PP(N): J''=N (F2) -> J'=N-1
        nu = term_b(N - 1.0, c) - f2
        rows.append((nu, float(N), f2 - e0, N, f"PP{N:2d}"))
        # PQ(N): J''=N-1 (F3) -> J'=N-1
        nu = term_b(N - 1.0, c) - f3
        rows.append((nu, (2 * (N - 1.0) + 1) / 2.0, f3 - e0, N - 1,
                     f"PQ{N:2d}"))
        # RR(N): J''=N (F2) -> J'=N+1
        nu = term_b(N + 1.0, c) - f2
        rows.append((nu, float(N + 1), f2 - e0, N, f"RR{N:2d}"))
        # RQ(N): J''=N+1 (F1) -> J'=N+1
        nu = term_b(N + 1.0, c) - f1
        rows.append((nu, (2 * (N + 1.0) + 1) / 2.0, f1 - e0, N + 1,
                     f"RQ{N:2d}"))

    nu = np.array([r[0] for r in rows])
    hl = np.array([r[1] for r in rows])
    elow = np.array([r[2] for r in rows])
    jpp = np.array([r[3] for r in rows], dtype=float)
    branch = [r[4] for r in rows]

    # Boltzmann envelope at 296 K; (2J+1) lives in the HL weights already
    boltz = hl * np.exp(-C2 * elow / T_REF)
    stim = 1.0 - np.exp(-C2 * nu / T_REF)
    s_rel = boltz * stim
    s_ref = (S_BAND * c["abundance"] / ISO_CONST[1]["abundance"]
             * s_rel / s_rel.sum())

    g_air = gamma_air_fit(jpp)
    g_self = 1.05 * g_air
    n_air = np.full_like(nu, 0.72)
    d_air = np.full_like(nu, -0.008)
    # J' = J'' + DeltaJ; DeltaJ = +1 (RR), -1 (PP), 0 (PQ/RQ)
    dj = np.array([0 if b[1] == "Q" else (+1 if b[0] == "R" else -1)
                   for b in branch])
    gp = 2.0 * (jpp + dj) + 1.0           # J' degeneracy
    gpp = 2.0 * jpp + 1.0
    # Einstein A from S (not used by the xsec path; rough magnitude)
    a_einst = np.full_like(nu, 8.0e-5)
    iso_col = np.full(len(nu), iso, dtype=int)
    return nu, s_ref, a_einst, g_air, g_self, elow, n_air, d_air, gp, gpp, \
        branch, iso_col


def format_par(nu, s, a, g_air, g_self, elow, n_air, d_air, gp, gpp,
               branch, iso_col):
    """HITRAN2004 160-char fixed-width records (mol=7 O2)."""
    lines = []
    for i in range(len(nu)):
        quanta_gu = "       b 0     "       # 15-char global upper (b v'=0)
        quanta_gl = "       X 0     "       # 15-char global lower (X v''=0)
        lq = f"{branch[i]:>15s}"
        # field-by-field to guarantee HITRAN2004 widths
        rec = (f"{7:2d}" + f"{int(iso_col[i]):1d}"
               + f"{nu[i]:12.6f}"
               + f"{s[i]:10.3E}"
               + f"{a[i]:10.3E}"
               + f"{g_air[i]:5.3f}"[:5]
               + f"{g_self[i]:5.3f}"[:5]
               + f"{elow[i]:10.4f}"
               + f"{n_air[i]:4.2f}"
               + f"{d_air[i]:8.5f}"[:8]
               + quanta_gu + quanta_gl
               + f"{'':15s}" + lq
               + " 0 0 0" + " " * 12 + " "
               + f"{gp[i]:7.1f}" + f"{gpp[i]:7.1f}")
        assert len(rec) == 160, (len(rec), rec)
        lines.append(rec)
    return lines


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "..", "data", "hitran", "O2.par")
    recs = []
    nus = []
    for iso in (1, 2):
        arrays = build_lines(iso=iso)
        recs.extend(format_par(*arrays))
        nus.extend(arrays[0].tolist())
    order = np.argsort(nus)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(recs[i] for i in order) + "\n")
    nus = np.asarray(nus)
    print(f"wrote {len(nus)} O2 A-band lines (16O2 + 16O18O) to {out_path} "
          f"({nus.min():.2f}-{nus.max():.2f} cm-1)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
