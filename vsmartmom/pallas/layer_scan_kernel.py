"""Fully-fused Pallas TPU kernel for the atmospheric layer scan.

One kernel runs, per spectral tile, the complete TOA->BOA composition:
Z-matrix mixing -> elemental single-scattering -> scheduled-Newton-Schulz
doubling -> interaction (adding), with the composite layer operators held
in VMEM scratch across the whole layer loop. HBM traffic collapses to the
per-layer scalars in (tau, omega, zw, tau_sum) and the final composite out
— the XLA path's per-matmul round trips (~75 GB/moment at 20k spectral
points) disappear entirely.

Grid = (spectral tiles, nZ); the layer axis is the innermost (sequential)
grid dimension, so VMEM scratch persists across it per tile (standard TPU
Pallas reduction pattern). Per-layer scalar inputs are laid out spectral-
major (nSpec, nZ) so one VMEM block holds every layer's column for the
tile; the kernel slices layer z with pl.ds. Physics matches core.rt
(elemental / doubling / interaction with identical operation order; gated
against the XLA scan in tests).

Forward-only (not differentiable) — core.rt remains the AD route.
ref: src/CoreRT/CoreKernel/{elemental,doubling,interaction}.jl and
rt_kernel.jl — the reference launches separate CUDA kernels + CUBLAS calls
per stage; on TPU the fusion is the point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsmartmom.core.rt import LayerRT

_BMM = (((2,), (1,)), ((0,), (0,)))


def _expm1(x):
    """exp(x) - 1 (Mosaic has no expm1 primitive): 6-term Taylor under
    |x| < 0.2 (rel. error < 2e-8, below f32 rounding), exp(x)-1 beyond
    (no cancellation there)."""
    p = x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (1.0 / 24.0
             + x * (1.0 / 120.0 + x * (1.0 / 720.0))))))
    return jnp.where(jnp.abs(x) < 0.2, p, jnp.exp(x) - 1.0)


def _exp_small(x):
    """e^x for the tiny per-step elemental arguments. TPU f32 jnp.exp
    rounds at ~2e-6 RELATIVE; the doubling recursion compounds that
    2^ndoubl-fold on the ~1.0 transmission diagonal (measured 1.6% vs
    the per-layer-step engine at ndoubl=16 before this fix). 1 + _expm1
    is correctly rounded near zero — the in-kernel analog of
    core.rt.exp_small."""
    return 1.0 + _expm1(x)


def _kernel(tau_ref, omega_ref, tausum_ref, zw_ref, zpp_ref, zmp_ref,
            qp_ref, wct2_ref, i0_ref, dv_ref, scal_ref,
            ci_rmp, ci_rpm, ci_tpp, ci_tmm, ci_jp, ci_jm,
            r_mp_o, r_pm_o, t_pp_o, t_mm_o, j_p_o, j_m_o,
            c_rmp, c_rpm, c_tpp, c_tmm, c_jp, c_jm,
            *, ns_schedule, inter_iters, i_mu0_n, n_stokes, n_k, scale):
    z = pl.program_id(1)
    n_z = pl.num_programs(1)
    mm = lambda a, b: lax.dot_general(a, b, _BMM,
                                      preferred_element_type=jnp.float32,
                                      precision=lax.Precision.HIGHEST)
    n = qp_ref.shape[1]
    eye = jnp.eye(n, dtype=jnp.float32)[None]

    def rsolve(x, a, iters):
        m = 2.0 * eye - a
        for _ in range(iters):
            m = mm(m, 2.0 * eye - mm(a, m))
        return mm(x, m)

    mu0 = scal_ref[0]
    mu0_node = scal_ref[1]
    wct02 = scal_ref[2]          # SMEM, not a static: m=0 vs m>0 share
                                 # the same Mosaic instance

    # --- layer column selection + Z mixing --------------------------------
    # (dynamic 1-lane slices are unsupported in Mosaic: select column z of
    # the (S, nZ) block with an iota mask + lane reduction instead)
    n_zc = tau_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, n_zc), 1)
    col = lambda v: jnp.sum(jnp.where(lane == z, v, 0.0), axis=1,
                            keepdims=True)
    tau = col(tau_ref[:])                    # (S, 1)
    omega = col(omega_ref[:])
    tau_sum = col(tausum_ref[:])
    s = tau.shape[0]
    lane3 = lax.broadcasted_iota(jnp.int32, (1, n_zc, 1), 1)
    zw_z = jnp.sum(jnp.where(lane3 == z, zw_ref[:], 0.0), axis=1)  # (S, K)
    z_pp = jnp.zeros((s, n, n), jnp.float32)
    z_mp = jnp.zeros_like(z_pp)
    for k in range(n_k):
        w = zw_z[:, k:k + 1, None]                       # (S, 1, 1)
        z_pp = z_pp + w * zpp_ref[k][None]
        z_mp = z_mp + w * zmp_ref[k][None]

    # --- elemental single scattering (rt.elemental, same op order) -------
    dtau = tau * (1.0 / scale)               # (S, 1)
    dt = dtau[:, :, None]                    # (S, 1, 1)
    om = omega[:, :, None]
    qp2 = qp_ref[:]                          # (1, N)
    mu_i = qp2[:, :, None]                   # (1, N, 1)
    mu_j = qp2[:, None, :]                   # (1, 1, N)
    same_mu = mu_i == mu_j                   # (1, N, N)
    eye_b = eye > 0.5
    wct2r = wct2_ref[:][:, None, :]          # (1, 1, N)
    col_mask = wct2r > 1e-8

    exp_i = _exp_small(-dt / mu_i)
    r_mp = (om * z_mp * (mu_j / (mu_i + mu_j)) * wct2r
            * (-_expm1(-dt * (1.0 / mu_i + 1.0 / mu_j))))
    r_mp = jnp.where(col_mask, r_mp, 0.0)

    t_diag = exp_i + exp_i * (om * z_pp * (dt / mu_i) * wct2r)
    denom = jnp.where(same_mu, 1.0, mu_i - mu_j)
    # expm1 argument as ONE subtraction of exact node values (same fix as
    # rt.elemental): dt/mu_j - dt/mu_i from two rounded quotients cancels
    # catastrophically for adjacent nodes in f32 (observed 0.3% layer error
    # at ndoubl=12); dt (mu_i - mu_j)/(mu_i mu_j) rounds once.
    exp_diff = (_exp_small(-dt / mu_j)
                * _expm1(dt * (mu_i - mu_j) / (mu_i * mu_j)))
    t_off = om * z_pp * (mu_j / denom) * wct2r * exp_diff
    t_pp = jnp.where(same_mu, jnp.where(eye_b, t_diag, 0.0), t_off)
    t_pp = jnp.where(col_mask, t_pp,
                     jnp.where(eye_b, exp_i * jnp.ones_like(t_pp), 0.0))

    i0_col = i0_ref[:][:, :, None]           # (1, N, 1)
    z_pp_i0 = mm(z_pp, jnp.broadcast_to(i0_col, (s, n, 1)))[:, :, 0]
    z_mp_i0 = mm(z_mp, jnp.broadcast_to(i0_col, (s, n, 1)))[:, :, 0]

    idx2 = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    in_block = (idx2 >= i_mu0_n) & (idx2 < i_mu0_n + n_stokes)   # (1, N)

    mu_iv = qp2                              # (1, N)
    dt_v = dtau                              # (S, 1)
    exp_iv = _exp_small(-dt_v / mu_iv)
    # degenerate limit also at any node whose mu equals mu0 (same guard +
    # one-subtraction expm1 argument as rt.elemental)
    same0 = in_block | (mu_iv == mu0_node)
    denom0 = jnp.where(same0, 1.0, mu_iv - mu0_node)
    exp_diff0 = (_exp_small(-dt_v / mu0_node)
                 * _expm1(dt_v * (mu_iv - mu0_node) / (mu_iv * mu0_node)))
    j_p = jnp.where(same0, (dt_v / mu_iv) * exp_iv,
                    (mu0_node / denom0) * exp_diff0)
    j_p = wct02 * omega * z_pp_i0 * j_p
    j_m = (wct02 * omega * z_mp_i0 * (mu0_node / (mu_iv + mu0_node))
           * (-_expm1(-dt_v * (1.0 / mu_iv + 1.0 / mu0_node))))
    atten = jnp.exp(-tau_sum / mu0_node)     # (S, 1)
    j_p = j_p * atten
    j_m = j_m * atten

    # --- doubling in flipped space (rt.doubling, same op order) ----------
    dv = dv_ref[:]                           # (1, N)
    r = dv[:, :, None] * r_mp
    t = t_pp
    jm = dv * j_m
    jp = j_p
    ek = _exp_small(-dtau / mu0)             # (S, 1)
    mv = lambda a, v: mm(a, v[:, :, None])[:, :, 0]
    for it in ns_schedule:
        a = eye - mm(r, r)
        tt = rsolve(t, a, it)
        j1p = jp * ek
        j1m = jm * ek
        jm = jm + mv(tt, j1m + mv(r, jp))
        jp = j1p + mv(tt, jp + mv(r, j1m))
        r = r + mm(tt, mm(r, t))
        t = mm(tt, t)
        ek = ek * ek

    sgn = dv[:, :, None] * dv[:, None, :]    # (1, N, N)
    a_rmp = dv[:, :, None] * r
    a_rpm = sgn * a_rmp
    a_tpp = t
    a_tmm = sgn * t
    a_jp = jp
    a_jm = dv * jm

    # --- interaction with the running composite (rt.interaction) ---------
    # The first grid step seeds the scratch composite from the kernel's
    # composite INPUT (a vacuum layer for the topmost bucket, the previous
    # bucket's output otherwise) and then runs the SAME interaction block:
    # with a vacuum composite (R=0, T=I, J=0) the adding algebra — incl.
    # the Newton-Schulz solve, whose iteration on A=I is exactly I —
    # reproduces the added layer bit-exactly, so no separate first-layer
    # variant (and no extra Mosaic instance) is needed.
    @pl.when(z == 0)
    def _():
        c_rmp[:] = ci_rmp[:]
        c_rpm[:] = ci_rpm[:]
        c_tpp[:] = ci_tpp[:]
        c_tmm[:] = ci_tmm[:]
        c_jp[:] = ci_jp[:]
        c_jm[:] = ci_jm[:]

    a1 = eye - mm(a_rmp, c_rpm[:])
    t01 = rsolve(c_tmm[:], a1, inter_iters)
    n_jm = c_jm[:] + mv(t01, mv(a_rmp, c_jp[:]) + a_jm)
    n_rmp = c_rmp[:] + mm(t01, mm(a_rmp, c_tpp[:]))
    n_tmm = mm(t01, a_tmm)

    a2 = eye - mm(c_rpm[:], a_rmp)
    t21 = rsolve(a_tpp, a2, inter_iters)
    n_jp = a_jp + mv(t21, c_jp[:] + mv(c_rpm[:], a_jm))
    n_tpp = mm(t21, c_tpp[:])
    n_rpm = a_rpm + mm(t21, mm(c_rpm[:], a_tmm))

    c_rmp[:] = n_rmp
    c_rpm[:] = n_rpm
    c_tpp[:] = n_tpp
    c_tmm[:] = n_tmm
    c_jp[:] = n_jp
    c_jm[:] = n_jm

    @pl.when(z == n_z - 1)
    def _():
        r_mp_o[:] = c_rmp[:]
        r_pm_o[:] = c_rpm[:]
        t_pp_o[:] = c_tpp[:]
        t_mm_o[:] = c_tmm[:]
        j_p_o[:] = c_jp[:]
        j_m_o[:] = c_jm[:]


@functools.partial(jax.jit, static_argnames=(
    "ns_schedule", "inter_iters", "i_mu0_n", "n_stokes", "block_s",
    "interpret"))
def fused_layer_scan(comp_in, tau, omega, zw, tau_sum, z_pp_c, z_mp_c, qp,
                     wct2, i0_vec, d_vec, mu0, mu0_node, wct02, *,
                     ns_schedule: tuple, i_mu0_n: int, n_stokes: int,
                     inter_iters: int = 4, block_s: int = 16,
                     interpret: bool = False) -> LayerRT:
    """Layer scan in one Pallas kernel; composite held in VMEM.

    comp_in: LayerRT composite ABOVE these layers (vacuum_layer(...) for
    the TOA bucket; chaining buckets with per-bucket static schedules
    gives the bucketed engine). tau/omega/tau_sum: (nZ, nSpec);
    zw: (nZ, K, nSpec); z_pp_c/z_mp_c: (K, N, N);
    qp/wct2/i0_vec/d_vec: (N,); mu0/mu0_node/wct02: scalars. Returns the
    composite through these layers (surface interaction is applied by
    the caller in XLA).
    """
    n_z, n_spec = tau.shape
    n_k = zw.shape[1]
    n = qp.shape[0]
    nd = len(ns_schedule)
    scale = float(2.0 ** nd)

    pad = (-n_spec) % block_s
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    # spectral-major layouts so one block holds all layers of a tile
    tau_t = jnp.pad(f32(tau).T, [(0, pad), (0, 0)])          # (nS', nZ)
    omega_t = jnp.pad(f32(omega).T, [(0, pad), (0, 0)])
    tausum_t = jnp.pad(f32(tau_sum).T, [(0, pad), (0, 0)])
    zw_t = jnp.pad(f32(zw).transpose(2, 0, 1),
                   [(0, pad), (0, 0), (0, 0)])               # (nS', nZ, K)
    n_pad = n_spec + pad
    pad_m = lambda x: jnp.pad(f32(x), [(0, pad), (0, 0), (0, 0)])
    pad_v = lambda x: jnp.pad(f32(x), [(0, pad), (0, 0)])
    ci = (pad_m(comp_in.r_mp), pad_m(comp_in.r_pm), pad_m(comp_in.t_pp),
          pad_m(comp_in.t_mm), pad_v(comp_in.j_p), pad_v(comp_in.j_m))

    row = lambda x: f32(x).reshape(1, n)
    scal = jnp.stack([f32(mu0), f32(mu0_node), f32(wct02)])

    grid = (n_pad // block_s, n_z)
    lay_spec = pl.BlockSpec((block_s, n_z), lambda i, z: (i, 0),
                            memory_space=pltpu.VMEM)
    zw_spec = pl.BlockSpec((block_s, n_z, n_k), lambda i, z: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    zc_spec = pl.BlockSpec((n_k, n, n), lambda i, z: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, n), lambda i, z: (0, 0),
                            memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    mat_io = pl.BlockSpec((block_s, n, n), lambda i, z: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_io = pl.BlockSpec((block_s, n), lambda i, z: (i, 0),
                          memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, ns_schedule=tuple(ns_schedule), inter_iters=inter_iters,
        i_mu0_n=i_mu0_n, n_stokes=n_stokes, n_k=n_k, scale=scale)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"))
    mats = jax.ShapeDtypeStruct((n_pad, n, n), jnp.float32)
    vecs = jax.ShapeDtypeStruct((n_pad, n), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[lay_spec, lay_spec, lay_spec, zw_spec, zc_spec, zc_spec,
                  row_spec, row_spec, row_spec, row_spec, scal_spec,
                  mat_io, mat_io, mat_io, mat_io, vec_io, vec_io],
        out_specs=[mat_io, mat_io, mat_io, mat_io, vec_io, vec_io],
        out_shape=[mats, mats, mats, mats, vecs, vecs],
        scratch_shapes=[pltpu.VMEM((block_s, n, n), jnp.float32)] * 4
                       + [pltpu.VMEM((block_s, n), jnp.float32)] * 2,
        interpret=interpret,
        **kwargs,
    )(tau_t, omega_t, tausum_t, zw_t, f32(z_pp_c), f32(z_mp_c),
      row(qp), row(wct2), row(i0_vec), row(d_vec), scal, *ci)
    if pad:
        out = [o[:n_spec] for o in out]
    return LayerRT(r_mp=out[0], r_pm=out[1], t_pp=out[2], t_mm=out[3],
                   j_p=out[4], j_m=out[5])
