"""Pallas TPU kernel: line-by-line Voigt cross-section synthesis.

The reference launches one GPU kernel per spectral line
(ref: src/Absorption/compute_absorption_cross_section.jl:117-125). Here the
wavenumber grid is tiled and each tile only sweeps the lines whose wing
window overlaps it (lines pre-sorted by wavenumber; per-tile chunk ranges
scalar-prefetched into the BlockSpec index maps), so work scales with the
cutoff window instead of the full band width per line.

TPU mapping: a grid tile is one (8, 128) f32 vreg; line parameters are
stored lane-replicated as (chunk, 128) blocks so a chunk of lines
broadcasts against the tile as (chunk, 8, 128) elementwise VPU work with
no lane<->sublane transposes. The Faddeeva Re w(z) (Humlicek region II /
Weideman-32 — the reference's default HumlicekWeidemann32SD CEF) is
implemented in explicit real arithmetic (no complex dtype on the VPU).

f32 precision note: wavenumbers are tile-centered on the host (absolute
~1e4 cm^-1 values would alias Doppler widths ~1e-2 cm^-1 at f32
resolution); the f64 reference path lives in spectroscopy.voigt.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S, TILE_L = 8, 128            # f32 VPU tile: grid points per program
TILE = TILE_S * TILE_L
CHUNK = 64                         # lines per program step

_ISQRTPI = 0.5641895835477563
_SQRT_LN2 = 0.8325546111576977
_SQRT_LN2_DIV_SQRT_PI = 0.46971863934982566
_L32 = float(np.sqrt(32.0 / np.sqrt(2.0)))
# Weideman (1994) N=32 coefficients (same table as spectroscopy.cef._W32)
from vsmartmom.spectroscopy.cef import _W32  # noqa: E402


def _rew_humlicek2(x, y):
    """Re w(z), Humlicek (1982) region II, real arithmetic.
    t = y - i x; w = t (1.410474 + u/sqrt(pi)) / (0.75 + u (3 + u))."""
    u_re = y * y - x * x
    u_im = -2.0 * x * y
    a = 1.410474 + _ISQRTPI * u_re
    b = _ISQRTPI * u_im
    num_re = y * a + x * b
    num_im = y * b - x * a
    d3 = 3.0 + u_re
    den_re = 0.75 + u_re * d3 - u_im * u_im
    den_im = u_im * d3 + u_re * u_im
    return ((num_re * den_re + num_im * den_im)
            / (den_re * den_re + den_im * den_im))


def _rew_weideman32(x, y):
    """Re w(z), Weideman-32 rational approximation, real arithmetic.
    iz = (-y, x); Z = (L + iz)/(L - iz); w = (1/sqrt(pi) + 2 poly(Z) R) R
    with R = 1/(L - iz)."""
    lr, li = _L32 + y, -x
    inv = 1.0 / (lr * lr + li * li)
    r_re, r_im = lr * inv, -li * inv            # R = 1/(L - iz)
    n_re, n_im = _L32 - y, x                    # L + iz
    z_re = n_re * r_re - n_im * r_im
    z_im = n_re * r_im + n_im * r_re
    # python-float coefficients stay weakly typed (a numpy f64 scalar
    # would promote the f32 kernel math under jax_enable_x64)
    p_re = jnp.full_like(x, float(_W32[-1]))
    p_im = jnp.zeros_like(x)
    for c in [float(v) for v in _W32[-2::-1]]:
        t_re = p_re * z_re - p_im * z_im + c
        p_im = p_re * z_im + p_im * z_re
        p_re = t_re
    q_re = 2.0 * (p_re * r_re - p_im * r_im) + _ISQRTPI
    q_im = 2.0 * (p_re * r_im + p_im * r_re)
    return q_re * r_re - q_im * r_im


def rew_hw32sd(x, y):
    """Re w(x + iy): |x| + y >= 8 -> Humlicek II, else Weideman-32
    (the reference's default CEF; spectroscopy.cef
    w_humlicek_weideman32_sd)."""
    s = jnp.abs(x) + y
    return jnp.where(s >= 8.0, _rew_humlicek2(x, y), _rew_weideman32(x, y))


def _voigt_kernel(start_ref, nchunk_ref, nu_ref, amp_ref, igd_ref, y_ref,
                  grid_ref, center_ref, cutoff_ref, out_ref):
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[0] = jnp.zeros((TILE_S, TILE_L), out_ref.dtype)

    @pl.when(k < nchunk_ref[t])
    def _accum():
        g = grid_ref[0]                       # (8, 128), tile-centered
        cutoff = cutoff_ref[0]
        nu = nu_ref[0] - center_ref[t]        # (CHUNK, 128), lane-replicated
        amp = amp_ref[0]
        igd = igd_ref[0]
        yv = y_ref[0]
        dx = g[None, :, :] - nu[:, None, :]   # (CHUNK, 8, 128)
        x = igd[:, None, :] * dx
        re_w = rew_hw32sd(x, jnp.broadcast_to(yv[:, None, :], x.shape))
        keep = (jnp.abs(dx) <= cutoff) & (amp[:, None, :] > 0.0)
        out_ref[0] += jnp.sum(
            jnp.where(keep, amp[:, None, :] * re_w, 0.0), axis=0)


@partial(jax.jit, static_argnames=("n_tiles", "max_chunks", "n_rows",
                                   "interpret"))
def _voigt_pallas_call(starts, n_chunks, nu, amp, igd, y, grid_t, centers,
                       cutoff, *, n_tiles, max_chunks, n_rows,
                       interpret=False):
    def line_map(t, k, s_ref, n_ref):
        return (jnp.minimum(s_ref[t] + k, n_rows - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, max_chunks),
        in_specs=[
            pl.BlockSpec((1, CHUNK, TILE_L), line_map),   # nu
            pl.BlockSpec((1, CHUNK, TILE_L), line_map),   # amp
            pl.BlockSpec((1, CHUNK, TILE_L), line_map),   # inv gamma_d
            pl.BlockSpec((1, CHUNK, TILE_L), line_map),   # y
            pl.BlockSpec((1, TILE_S, TILE_L),
                         lambda t, k, *_: (t, 0, 0)),     # grid tile
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tile centers
            pl.BlockSpec(memory_space=pltpu.SMEM),        # cutoff
        ],
        out_specs=pl.BlockSpec((1, TILE_S, TILE_L),
                               lambda t, k, *_: (t, 0, 0)),
    )
    return pl.pallas_call(
        _voigt_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L),
                                       grid_t.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, n_chunks, nu, amp, igd, y, grid_t, centers, cutoff)


def voigt_xsec_pallas(grid, nu_s, strength, gamma_d, y, wing_cutoff,
                      interpret=None):
    """sigma(grid) = sum_l S_l sqrt(ln2/pi)/gamma_d Re w(...), tiled.

    grid must be sorted ascending; inputs are host numpy; f32 compute.
    Returns np.ndarray (n_grid,).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    grid64 = np.asarray(grid, np.float64)
    nu0 = 0.5 * (grid64[0] + grid64[-1])
    n_grid = len(grid64)
    order = np.argsort(nu_s, kind="stable")
    nu64 = np.asarray(nu_s, np.float64)[order] - nu0
    amp = (np.asarray(strength)
           * _SQRT_LN2_DIV_SQRT_PI / np.asarray(gamma_d))[order]
    igd = (_SQRT_LN2 / np.asarray(gamma_d))[order].astype(np.float32)
    yv = np.asarray(y, np.float32)[order]
    amp = np.maximum(amp.astype(np.float32), np.float32(1e-45))

    # tile the grid; pad far away so padded points never see a line
    n_tiles = (n_grid + TILE - 1) // TILE
    pad_g = n_tiles * TILE - n_grid
    g_rel = grid64 - nu0
    grid_p = np.concatenate([g_rel, np.full(pad_g, g_rel[-1] + 1e6)])
    tiles = grid_p.reshape(n_tiles, TILE)
    hi_real = np.array([grid_p[min((t + 1) * TILE, n_grid) - 1]
                        for t in range(n_tiles)])
    centers = 0.5 * (tiles[:, 0] + hi_real)
    grid_t = (tiles - centers[:, None]).astype(np.float32) \
        .reshape(n_tiles, TILE_S, TILE_L)

    # per-tile chunk ranges over sorted lines
    lo = tiles.min(axis=1) - wing_cutoff
    hi = np.array([grid_p[min((t + 1) * TILE, n_grid) - 1]
                   for t in range(n_tiles)]) + wing_cutoff
    first = np.searchsorted(nu64, lo, side="left")
    last = np.searchsorted(nu64, hi, side="right")
    start_row = (first // CHUNK).astype(np.int32)
    n_ck = np.maximum(
        -(-(last - start_row * CHUNK) // CHUNK), 0).astype(np.int32)
    max_chunks = max(int(n_ck.max()), 1)

    # pad lines to whole chunks, lane-replicate (amp = 0 masks padding)
    n_l = len(nu64)
    n_rows = max((n_l + CHUNK - 1) // CHUNK, 1)
    pad_l = n_rows * CHUNK - n_l

    def rep(v, fill):
        flat = np.concatenate([np.asarray(v, np.float32),
                               np.full(pad_l, fill, np.float32)])
        return np.repeat(flat[:, None], TILE_L, axis=1) \
            .reshape(n_rows, CHUNK, TILE_L)

    nu_p = rep(nu64, 1e30)
    amp_p = rep(amp, 0.0)
    igd_p = rep(igd, 1.0)
    y_p = rep(yv, 1.0)

    out = _voigt_pallas_call(
        jnp.asarray(start_row), jnp.asarray(n_ck),
        jnp.asarray(nu_p), jnp.asarray(amp_p), jnp.asarray(igd_p),
        jnp.asarray(y_p), jnp.asarray(grid_t),
        jnp.asarray(centers.astype(np.float32)),
        jnp.asarray([np.float32(wing_cutoff)]),
        n_tiles=n_tiles, max_chunks=max_chunks, n_rows=n_rows,
        interpret=bool(interpret))
    return np.asarray(out).reshape(-1)[:n_grid]


@partial(jax.jit, static_argnames=("n_tiles", "max_chunks", "n_rows",
                                   "n_l", "interpret"))
def _voigt_exec(order, starts, n_chunks, nu_rel, strength, gamma_d, y,
                grid_t, centers, cutoff,
                *, n_tiles, max_chunks, n_rows, n_l, interpret=False):
    """Device-side tail of a VoigtPlan run (single dispatch): sort-gather,
    line-parameter math, pad + lane-replicate, kernel call."""
    nu = nu_rel[order]
    amp = jnp.maximum(
        (strength[order] * _SQRT_LN2_DIV_SQRT_PI
         / gamma_d[order]).astype(jnp.float32), jnp.float32(1e-45))
    igd = (_SQRT_LN2 / gamma_d[order]).astype(jnp.float32)
    yv = y[order].astype(jnp.float32)
    pad_l = n_rows * CHUNK - n_l

    def rep(v, fill):
        flat = jnp.concatenate(
            [v.astype(jnp.float32),
             jnp.full((pad_l,), fill, jnp.float32)])
        return jnp.broadcast_to(flat[:, None],
                                (n_rows * CHUNK, TILE_L)) \
            .reshape(n_rows, CHUNK, TILE_L)

    return _voigt_pallas_call(
        starts, n_chunks, rep(nu, 1e30), rep(amp, 0.0), rep(igd, 1.0),
        rep(yv, 1.0), grid_t, centers, cutoff,
        n_tiles=n_tiles, max_chunks=max_chunks, n_rows=n_rows,
        interpret=interpret)


class VoigtPlan:
    """Reusable tiling/bucketing plan for one (grid, line-list) pair.

    Host work (sorting, tiling, per-tile line buckets) happens once; each
    ``run`` call ships the per-(p, T) line-parameter vectors and runs as a
    single jitted dispatch on device. Buckets come from the unshifted line
    positions with a ``shift_margin`` [cm^-1] slack for pressure shifts.
    """

    def __init__(self, grid, nu_lines, wing_cutoff, shift_margin=0.5,
                 interpret=None):
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = bool(interpret)
        grid64 = np.asarray(grid, np.float64)
        self.nu0 = 0.5 * (grid64[0] + grid64[-1])
        self.n_grid = len(grid64)
        order = np.argsort(nu_lines, kind="stable")
        nu64 = np.asarray(nu_lines, np.float64)[order] - self.nu0
        self.order = jnp.asarray(order.astype(np.int32))
        self.wing_cutoff = float(wing_cutoff)

        self.n_tiles = (self.n_grid + TILE - 1) // TILE
        pad_g = self.n_tiles * TILE - self.n_grid
        g_rel = grid64 - self.nu0
        grid_p = np.concatenate([g_rel, np.full(pad_g, g_rel[-1] + 1e6)])
        tiles = grid_p.reshape(self.n_tiles, TILE)
        # center each tile on its REAL points only (a padded last tile
        # would otherwise shift the center by ~1e6 and destroy f32
        # precision for its real points)
        hi_real = np.array([grid_p[min((t + 1) * TILE, self.n_grid) - 1]
                            for t in range(self.n_tiles)])
        centers = 0.5 * (tiles[:, 0] + hi_real)
        self.grid_t = jnp.asarray(
            (tiles - centers[:, None]).astype(np.float32)
            .reshape(self.n_tiles, TILE_S, TILE_L))
        self.centers = jnp.asarray(centers.astype(np.float32))

        pad = wing_cutoff + shift_margin
        lo = tiles.min(axis=1) - pad
        hi = np.array([grid_p[min((t + 1) * TILE, self.n_grid) - 1]
                       for t in range(self.n_tiles)]) + pad
        first = np.searchsorted(nu64, lo, side="left")
        last = np.searchsorted(nu64, hi, side="right")
        start_row = (first // CHUNK).astype(np.int32)
        n_ck = np.maximum(
            -(-(last - start_row * CHUNK) // CHUNK), 0).astype(np.int32)
        self.max_chunks = max(int(n_ck.max()), 1)
        self.n_l = len(nu64)
        self.n_rows = max((self.n_l + CHUNK - 1) // CHUNK, 1)
        self.starts = jnp.asarray(start_row)
        self.n_chunks = jnp.asarray(n_ck)
        self.cutoff = jnp.asarray([np.float32(wing_cutoff)])

    def run(self, nu_s, strength, gamma_d, y):
        """sigma(grid) for pressure-shifted line positions nu_s and
        per-line strength/Doppler-width/y (original line order).

        nu_s should be host float64 (the band-centering subtraction
        happens at f64 before the f32 cast — absolute wavenumbers exceed
        f32 resolution relative to Doppler widths).
        """
        nu_rel = jnp.asarray(
            (np.asarray(nu_s, np.float64) - self.nu0).astype(np.float32))
        out = _voigt_exec(
            self.order, self.starts, self.n_chunks, nu_rel,
            jnp.asarray(strength, jnp.float32),
            jnp.asarray(gamma_d, jnp.float32),
            jnp.asarray(y, jnp.float32),
            self.grid_t, self.centers, self.cutoff,
            n_tiles=self.n_tiles, max_chunks=self.max_chunks,
            n_rows=self.n_rows, n_l=self.n_l, interpret=self.interpret)
        return out.reshape(-1)[:self.n_grid]
