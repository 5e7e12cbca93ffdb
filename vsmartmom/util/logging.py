"""Run observability: logger, run banner, AOD report, progress.

ref: the reference's Julia @info run banner (rt_run.jl:99-106: geometry +
array dims), the per-aerosol AOD report (model_from_parameters.jl:164),
and ProgressMeter.@showprogress on the layer / line / radius loops
(rt_run.jl:142, atmo_prof.jl:438, compute_NAI2.jl:80).

Python side: a package logger (stderr, INFO default; silence with
VSMARTMOM_LOG=0 or logging config) + tiny helpers. Progress is rendered
only for interactive stderr (isatty) so batch logs stay clean.
"""
from __future__ import annotations

import logging
import os
import sys
import time

logger = logging.getLogger("vsmartmom")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[vsmartmom] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.WARNING
                    if os.environ.get("VSMARTMOM_LOG", "1") == "0"
                    else logging.INFO)
    logger.propagate = False


def run_banner(pol, quad, n_spec: int, n_z: int, max_m: int, surface,
               engine: str, solver: str, dtype):
    """One-line run description (ref: rt_run.jl:99-106 @info banner)."""
    logger.info(
        "rt_run: %s, Nquad=%d (N=%d), nSpec=%d, nZ=%d, max_m=%d, "
        "sza=%.2f deg, surface=%s, engine=%s/%s, %s",
        getattr(pol, "name", pol), quad.n_quad, len(quad.qp_mu_n), n_spec,
        n_z, max_m, float(__import__("numpy").degrees(
            __import__("numpy").arccos(quad.mu0))),
        surface.get("type", "?"), engine, solver,
        getattr(dtype, "__name__", str(dtype)))


def aod_report(aerosol_names, tau_aer, band_label=""):
    """Per-aerosol column optical depth (ref: model_from_parameters.jl:164
    '@info AOD at reference wavelength')."""
    import numpy as np
    for name, tau in zip(aerosol_names, tau_aer):
        logger.info("aerosol %s%s: column AOD = %.4f", name,
                    f" ({band_label})" if band_label else "",
                    float(np.sum(tau)))


class progress:
    """Minimal @showprogress equivalent for host-side loops.

    for iz in progress(range(n_z), "layers"): ...
    Renders a carriage-return bar on interactive stderr only.
    """

    def __init__(self, iterable, label="", stream=None):
        self.it = iterable
        self.label = label
        self.stream = stream if stream is not None else sys.stderr
        self.n = len(iterable) if hasattr(iterable, "__len__") else None

    def __iter__(self):
        interactive = hasattr(self.stream, "isatty") and \
            self.stream.isatty() and self.n
        t0 = time.perf_counter()
        for i, x in enumerate(self.it):
            yield x
            if interactive:
                frac = (i + 1) / self.n
                bar = "=" * int(40 * frac)
                self.stream.write(
                    f"\r{self.label} [{bar:<40}] "
                    f"{i + 1}/{self.n} ({time.perf_counter() - t0:.1f}s)")
                self.stream.flush()
        if interactive:
            self.stream.write("\n")
