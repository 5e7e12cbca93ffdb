"""Lanes-layout fused RT layer step for SMALL quadratures (Stokes-I).

The MXU-based fused kernel (pallas/layer_step_kernel.py) is bound by
per-batch-element matmul issue at small N: measured on TPU v5e, its
runtime is ~(total sublane rows) / 0.9 rows/cycle regardless of N — a
(16, 15, 15) batched matmul costs the same as (16, 60, 60), i.e. the
128x128 MXU runs ~1% utilized at N = 15 (the flagship Stokes-I size).

This kernel flips the layout: SPECTRAL POINTS RIDE THE 128-LANE AXIS.
Arrays are (N, N, S) / (N, S); a matrix product C = A B becomes N
broadcast FMAs over (N, N, S) vectors on the VPU:

    C[i, j, s] = sum_k A[i, k, s] * B[k, j, s]
    -> for k in range(N): C += A[:, k, None, :] * B[None, k, :, :]

The VPU does 8x128 f32 FMAs/cycle, fully utilized for any S >= 128 —
cost scales as N^3 S / 1024 cycles per product, which should beat the
MXU path's N S / 0.9 row-cycles whenever N^2 < ~1100, i.e. N <= ~33.

MEASURED RESULT (TPU v5e, Mosaic of jax 0.8.x): 3354 ms/step at
(N=15, S=2048) vs 5.8 ms for the MXU kernel — 600x SLOWER than
predicted. Mosaic scalarizes the leading-dim broadcast FMAs
((N,1,S)*(1,N,S)) instead of vectorizing them across the (sublane,
lane) = (N, S) planes. Kept as an algebra-validated experiment (the
shared pure-jnp body is gated against core.rt in
tests/test_pallas_doubling.py); NEVER auto-selected — revisit when
Mosaic handles leading-dim broadcasts natively.

Same algebra as core.rt.doubling + core.rt.interaction (scheduled
Newton-Schulz right-solves, D-symmetry flips); forward-only.
ref: src/CoreRT/CoreKernel/{doubling,interaction}.jl.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsmartmom.core.rt import LayerRT


def to_lanes_m(x):
    """(S, N, N) -> (N, N, S)"""
    return jnp.transpose(x, (1, 2, 0))


def from_lanes_m(x):
    return jnp.transpose(x, (2, 0, 1))


def to_lanes_v(v):
    """(S, N) -> (N, S)"""
    return jnp.transpose(v, (1, 0))


def from_lanes_v(v):
    return jnp.transpose(v, (1, 0))


def _mm(a, b):
    """(N,N,S) @ (N,N,S) pointwise-over-lanes matrix product on the VPU.
    Pure slices only — integer indexing lowers to a (>2D) gather, which
    Mosaic cannot lower."""
    n = a.shape[0]
    acc = a[:, 0:1, :] * b[0:1, :, :]
    for k in range(1, n):
        acc = acc + a[:, k:k + 1, :] * b[k:k + 1, :, :]
    return acc


def _mv(a, v):
    """(N,N,S) @ (N,S) -> (N,S): sum over the sublane (k) axis."""
    return jnp.sum(a * v[None, :, :], axis=1)


def _ns_m(a, eye, iters):
    """Newton-Schulz inverse of A = I - B (rho(B) < 1); same op order as
    core.rt.make_rsolve('schulz')."""
    eye2 = 2.0 * eye
    m = eye2 - a
    for _ in range(iters):
        m = _mm(m, eye2 - _mm(a, m))
    return m


def lanes_layer_step_math(c_rmp, c_rpm, c_tpp, c_tmm, c_jp, c_jm,
                          r, t, jp, jm, ek, d, *, ns_schedule, ni):
    """Pure-jnp body of the lanes layer step (doubling + interaction) —
    shared by the Pallas kernel and the CPU correctness tests (interpret
    mode is ~1000x too slow for this op count)."""
    n = r.shape[0]
    eye = jnp.eye(n, dtype=r.dtype)[:, :, None]

    # --- 1. doubling (flipped space; ref doubling.jl:43-68) ---
    for it in ns_schedule:
        a = eye - _mm(r, r)
        m = _ns_m(a, eye, it)
        j1p = jp * ek
        j1m = jm * ek
        v1 = j1m + _mv(r, jp)
        v2 = jp + _mv(r, j1m)
        # tt @ X = t @ (M @ X), tt never materialized
        rt_ = _mm(r, t)
        r = r + _mm(t, _mm(m, rt_))
        jm = jm + _mv(t, _mv(m, v1))
        jp = j1p + _mv(t, _mv(m, v2))
        t = _mm(t, _mm(m, t))
        ek = ek * ek

    r2mp = d[:, :, None] * r             # un-flip rows (d_i); d is (N, 1)
    j2m = d * jm
    sgn = d[:, None, :] * d[None, :, :]  # (N, N, 1)
    r2pm = sgn * r2mp
    t2mm = sgn * t

    # --- 2. interaction (ref interaction.jl:69-117) ---
    a1 = eye - _mm(r2mp, c_rpm)
    m1 = _ns_m(a1, eye, ni)
    o_jm = c_jm + _mv(c_tmm, _mv(m1, _mv(r2mp, c_jp) + j2m))
    o_rmp = c_rmp + _mm(c_tmm, _mm(m1, _mm(r2mp, c_tpp)))
    o_tmm = _mm(c_tmm, _mm(m1, t2mm))

    a2 = eye - _mm(c_rpm, r2mp)
    m2 = _ns_m(a2, eye, ni)
    o_jp = jp + _mv(t, _mv(m2, c_jp + _mv(c_rpm, j2m)))
    o_tpp = _mm(t, _mm(m2, c_tpp))
    o_rpm = r2pm + _mm(t, _mm(m2, _mm(c_rpm, t2mm)))
    return o_rmp, o_rpm, o_tpp, o_tmm, o_jp, o_jm


def _lanes_kernel(cr_mp_ref, cr_pm_ref, ct_pp_ref, ct_mm_ref,
                  cjp_ref, cjm_ref,
                  r_ref, t_ref, jp_ref, jm_ref, ek_ref, d_ref,
                  or_mp, or_pm, ot_pp, ot_mm, ojp, ojm,
                  *, ns_schedule, ni):
    outs = lanes_layer_step_math(
        cr_mp_ref[:], cr_pm_ref[:], ct_pp_ref[:], ct_mm_ref[:],
        cjp_ref[:], cjm_ref[:],
        r_ref[:], t_ref[:], jp_ref[:], jm_ref[:], ek_ref[:], d_ref[:],
        ns_schedule=ns_schedule, ni=ni)
    for ref, val in zip((or_mp, or_pm, ot_pp, ot_mm, ojp, ojm), outs):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("ns_schedule", "ni",
                                             "block_lanes", "interpret"))
def fused_layer_step_lanes(comp_l, r_f, t, jp, jm_f, ek, d_vec, *,
                           ns_schedule: tuple, ni: int = 4,
                           block_lanes: int = 1024,
                           interpret: bool = False):
    """One RT layer step in lanes layout. ``comp_l`` is a LayerRT whose
    matrices are (N, N, S) and vectors (N, S) — keep the composite in this
    layout across the whole layer scan (convert once with to_lanes_m /
    from_lanes_m). r_f/t: (N, N, S); jp/jm_f: (N, S); ek: (S,);
    d_vec: (N,). Returns the new composite in lanes layout."""
    n, _, s = r_f.shape
    pad = (-s) % block_lanes
    mats = [comp_l.r_mp, comp_l.r_pm, comp_l.t_pp, comp_l.t_mm]
    vecs = [comp_l.j_p, comp_l.j_m]
    amats = [r_f, t]
    avecs = [jp, jm_f]
    if pad:
        zm = [(0, 0), (0, 0), (0, pad)]
        zv = [(0, 0), (0, pad)]
        eye_pad = np.zeros((n, n, pad), r_f.dtype)
        eye_pad[np.arange(n), np.arange(n), :] = 1.0
        mats = [jnp.pad(mats[0], zm), jnp.pad(mats[1], zm),
                jnp.concatenate([mats[2], eye_pad], axis=2),
                jnp.concatenate([mats[3], eye_pad], axis=2)]
        vecs = [jnp.pad(v, zv) for v in vecs]
        amats = [jnp.pad(m, zm) for m in amats]
        avecs = [jnp.pad(v, zv) for v in avecs]
        ek = jnp.pad(ek, [(0, pad)])
    s_pad = s + pad
    ek2 = ek.reshape(1, s_pad)
    d2 = jnp.asarray(d_vec, r_f.dtype).reshape(n, 1)

    grid = (s_pad // block_lanes,)
    mat_spec = pl.BlockSpec((n, n, block_lanes), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((n, block_lanes), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    ek_spec = pl.BlockSpec((1, block_lanes), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    kern = functools.partial(_lanes_kernel, ns_schedule=tuple(ns_schedule),
                             ni=ni)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)
    mshape = jax.ShapeDtypeStruct((n, n, s_pad), r_f.dtype)
    vshape = jax.ShapeDtypeStruct((n, s_pad), r_f.dtype)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[mat_spec] * 4 + [vec_spec] * 2
                 + [mat_spec] * 2 + [vec_spec] * 2 + [ek_spec, d_spec],
        out_specs=[mat_spec] * 4 + [vec_spec] * 2,
        out_shape=[mshape] * 4 + [vshape] * 2,
        interpret=interpret,
        **kwargs,
    )(*mats, *vecs, *amats, *avecs, ek2, d2)
    if pad:
        out = [o[..., :s] for o in out]
    return LayerRT(r_mp=out[0], r_pm=out[1], t_pp=out[2], t_mm=out[3],
                   j_p=out[4], j_m=out[5])
