"""Generate a physics-derived solar transmission line list (Toon-format).

This environment is air-gapped: the reference downloads Geoff Toon's
GGG2014 merged solar transmission spectrum at first use
(ref: /root/reference/src/SolarModel/SolarModel.jl:141-143) — no copy
exists on disk. This tool synthesizes a usable stand-in from published
Fraunhofer-line data so instrument-grade demos (Ring-effect filling-in,
solar-referenced radiances) see real solar structure at the right places:

  * Line positions: classical Fraunhofer lines + the strongest optical
    atlas lines, air wavelengths from the NIST/Allen tables, converted to
    vacuum wavenumber with the Edlen (1966) dispersion of standard air.
  * Line strengths: published disk-integrated equivalent widths (Allen's
    Astrophysical Quantities, 4th ed., table of strongest solar lines).
  * Line shapes: Voigt-like — Gaussian core (photospheric Doppler+rotation
    ~3 km/s e-folding) with Lorentzian damping wings for the strong
    resonance lines (Ca II H/K, Na D, Mg b, H Balmer), scaled so the
    profile integral reproduces the published equivalent width.

Swap in the real GGG2014 `solar.out` (two-column nu, transmission) for
line-exact work — the loader (solar_linelist_path) picks up either.

Output: data/solar/solar.out — two-column (vacuum cm^-1, transmission) on
a non-uniform grid (dense across lines, sparse continuum; the loader
interpolates linearly).
"""
import os
import sys

import numpy as np

# (air wavelength [Angstrom], equivalent width [Angstrom], core depth,
#  name) — EWs from Allen's Astrophysical Quantities; depths approximate
# disk-integrated central depths (saturated resonance lines ~0.85-0.95).
LINES = [
    (3820.43, 1.71, 0.80, "Fe I (L)"),
    (3933.66, 20.25, 0.94, "Ca II K"),
    (3968.47, 15.47, 0.93, "Ca II H"),
    (4045.81, 1.17, 0.75, "Fe I"),
    (4101.75, 3.13, 0.78, "H-delta"),
    (4226.73, 1.48, 0.82, "Ca I g"),
    (4271.76, 0.76, 0.70, "Fe I"),
    (4340.47, 2.86, 0.78, "H-gamma"),
    (4383.55, 1.01, 0.75, "Fe I d"),
    (4861.34, 3.68, 0.80, "H-beta F"),
    (5167.32, 0.94, 0.78, "Mg I b4"),
    (5172.68, 1.26, 0.82, "Mg I b2"),
    (5183.60, 1.58, 0.84, "Mg I b1"),
    (5270.39, 0.88, 0.72, "Fe I+Ca I E2"),
    (5889.95, 0.75, 0.88, "Na I D2"),
    (5895.92, 0.56, 0.85, "Na I D1"),
    (6562.81, 4.02, 0.84, "H-alpha C"),
    (7664.90, 0.13, 0.55, "K I"),
    (7698.96, 0.15, 0.55, "K I"),
    (8498.02, 1.46, 0.60, "Ca II IRT"),
    (8542.09, 3.67, 0.72, "Ca II IRT"),
    (8662.14, 2.60, 0.70, "Ca II IRT"),
]

V_DOPPLER = 3.0e5       # cm/s equivalent width of the Gaussian core


def n_air_edlen(wl_air_angstrom):
    """Edlen (1966) refractive index of standard air."""
    s2 = (1e4 / wl_air_angstrom) ** 2       # (1/um)^2
    return 1.0 + 1e-8 * (8342.13 + 2406030.0 / (130.0 - s2)
                         + 15997.0 / (38.9 - s2))


def vacuum_wavenumber(wl_air_angstrom):
    wl_vac = wl_air_angstrom * n_air_edlen(wl_air_angstrom)
    return 1e8 / wl_vac


def line_profile(nu, nu0, ew_wn, depth):
    """Absorption depth profile d(nu) with integral == ew_wn.

    Gaussian core of fixed Doppler width; when the saturated-core EW
    exceeds what the Gaussian at ``depth`` can carry, the excess goes into
    a Lorentzian damping-wing component (strong-line behavior)."""
    sigma = nu0 * (1.0e3 * 3.0) / 2.99792458e8   # 3 km/s in wavenumbers
    ew_core = depth * sigma * np.sqrt(2.0 * np.pi)
    prof = depth * np.exp(-0.5 * ((nu - nu0) / sigma) ** 2)
    ew_rest = ew_wn - ew_core
    if ew_rest > 0:
        # Lorentzian with peak 0.6*depth carrying the remaining EW:
        # integral = pi * a * gamma  ->  gamma = ew_rest / (pi * a)
        a = 0.6 * depth
        gamma = ew_rest / (np.pi * a)
        prof = prof + a * gamma**2 / ((nu - nu0) ** 2 + gamma**2)
    return np.minimum(prof, 0.995)


def build(path):
    nu0s, ews, depths = [], [], []
    for wl, ew_a, d, _name in LINES:
        nu0 = vacuum_wavenumber(wl)
        # EW in wavenumber units: dnu = nu^2 * dlambda (lambda in cm)
        ew_wn = ew_a * 1e-8 * nu0**2
        nu0s.append(nu0)
        ews.append(ew_wn)
        depths.append(d)

    # Non-uniform grid: 0.01 cm^-1 within +-25 cm^-1 of any line,
    # 5 cm^-1 elsewhere over the Toon range (600 - 26316 cm^-1).
    segs = [np.arange(600.0, 26316.0, 5.0)]
    for nu0 in nu0s:
        segs.append(np.arange(nu0 - 25.0, nu0 + 25.0, 0.01))
    nu = np.unique(np.concatenate(segs))

    depth_total = np.zeros_like(nu)
    for nu0, ew, d in zip(nu0s, ews, depths):
        m = np.abs(nu - nu0) < 300.0
        depth_total[m] += line_profile(nu[m], nu0, ew, d)
    trans = np.clip(1.0 - depth_total, 0.005, 1.0)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# Synthetic Fraunhofer solar transmission "
                "(tools/make_solar_linelist.py)\n")
        np.savetxt(f, np.column_stack([nu, trans]), fmt="%.4f %.6f")
    print(f"wrote {len(nu)} samples, {len(LINES)} lines -> {path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "data", "solar", "solar.out")
    build(out)
