"""Cross-section look-up tables: build, save/load, interpolate.

ref: src/Absorption/make_model_helpers.jl:55-110 (make_interpolation_model,
save/load via JLD2 — here npz) and
compute_absorption_cross_section.jl InterpolationModel path.
"""
from __future__ import annotations

import dataclasses

import numpy as np
from scipy.interpolate import RegularGridInterpolator

from vsmartmom.spectroscopy.voigt import (HitranModel,
                                          compute_absorption_cross_section)


@dataclasses.dataclass
class InterpolationModel:
    """sigma(nu, p, T) cube with trilinear interpolation.

    ref: Absorption/types.jl:193-211. (The reference uses cubic B-splines
    on the uniform cube; linear is used here — the HAPI-equivalence gate
    tolerance is enforced by test, and the LUT grids are caller-chosen.)
    """
    sigma: np.ndarray          # (n_nu, n_p, n_t)
    nu_grid: np.ndarray
    p_grid: np.ndarray
    t_grid: np.ndarray
    mol: int = -1
    iso: int = -1

    def __post_init__(self):
        self._itp = RegularGridInterpolator(
            (self.nu_grid, self.p_grid, self.t_grid), self.sigma,
            bounds_error=False, fill_value=None)

    def __call__(self, grid, pressure, temperature):
        pts = np.stack([np.asarray(grid, dtype=np.float64),
                        np.full(len(grid), pressure),
                        np.full(len(grid), temperature)], axis=-1)
        return self._itp(pts)


def make_interpolation_model(hitran_model: HitranModel, nu_grid, p_grid,
                             t_grid) -> InterpolationModel:
    """Precompute the sigma(nu, p, T) cube from a HitranModel.

    ref: make_model_helpers.jl:55-99
    """
    nu_grid = np.asarray(nu_grid, dtype=np.float64)
    p_grid = np.asarray(p_grid, dtype=np.float64)
    t_grid = np.asarray(t_grid, dtype=np.float64)
    cube = np.zeros((len(nu_grid), len(p_grid), len(t_grid)))
    for ip, p in enumerate(p_grid):
        for it, t in enumerate(t_grid):
            cube[:, ip, it] = np.asarray(
                compute_absorption_cross_section(hitran_model, nu_grid, p, t))
    ht = hitran_model.hitran
    return InterpolationModel(sigma=cube, nu_grid=nu_grid, p_grid=p_grid,
                              t_grid=t_grid,
                              mol=int(ht.mol[0]), iso=int(ht.iso[0]))


def save_interpolation_model(model: InterpolationModel, path: str):
    """ref: make_model_helpers.jl:101-105 (JLD2 -> npz)"""
    np.savez_compressed(path, sigma=model.sigma, nu_grid=model.nu_grid,
                        p_grid=model.p_grid, t_grid=model.t_grid,
                        mol=model.mol, iso=model.iso)


def load_interpolation_model(path: str) -> InterpolationModel:
    """ref: make_model_helpers.jl:107-110"""
    d = np.load(path)
    return InterpolationModel(sigma=d["sigma"], nu_grid=d["nu_grid"],
                              p_grid=d["p_grid"], t_grid=d["t_grid"],
                              mol=int(d["mol"]), iso=int(d["iso"]))
