"""Fused Pallas TPU kernel for one full RT layer step (doubling + adding).

Extends pallas/doubling_kernel.py to the whole per-layer update of the
layer scan: grow the elemental layer by doubling AND compose it with the
carried composite (ref: src/CoreRT/CoreKernel/{doubling,interaction}.jl,
driven from rt_kernel.jl:173-235) — all in one VMEM-resident kernel.

Why: with separate kernels the doubled added layer (2 N^2 matrices + 2
vectors per spectral point) round-trips HBM between doubling and
interaction, and the XLA interaction path issues ~15 HBM-bound batched
matmuls per layer. Keeping the added layer in VMEM and lane-packing the
interaction (same scheme as the doubling kernel: every right-hand operand
sharing a left matrix rides one MXU pass) cuts per-layer HBM traffic to
one read of the composite + elemental and one write of the composite.

The added layer produced by doubling is D-symmetric (r_pm = sgn * r_mp,
t_mm = sgn * t_pp with sgn = d d^T), so only r_mp/t_pp are ever formed;
the composite is not D-symmetric (layers differ) and carries all six
fields. Algebra matches core.rt.interaction / core.rt.doubling exactly
(same dot products; solver association t @ (M @ X)).

Forward runs only (not differentiable) — core.rt stays the AD route.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsmartmom.pallas.doubling_kernel import batch_mm, doubling_body


def ns_m(mm, a, iters):
    """Newton-Schulz approximate inverse M of A = I - B, rho(B) < 1.
    Matches core.rt.make_rsolve('schulz', iters) operation-for-operation."""
    n = a.shape[-1]
    eye2 = 2.0 * jnp.eye(n, dtype=a.dtype)[None]
    m = eye2 - a
    for _ in range(iters):
        m = mm(m, eye2 - mm(a, m))
    return m


def _layer_step_kernel(cr_mp_ref, cr_pm_ref, ct_pp_ref, ct_mm_ref,
                       cjp_ref, cjm_ref,
                       r_ref, t_ref, jp_ref, jm_ref, ek_ref, d_ref,
                       or_mp, or_pm, ot_pp, ot_mm, ojp, ojm,
                       *, ns_schedule, ni, precision):
    mm = batch_mm(precision)

    # --- 1. doubling of the elemental layer (flipped space) ---
    r_f, t2, jp2, jm_f = doubling_body(
        mm, r_ref[:], t_ref[:], jp_ref[:], jm_ref[:], ek_ref[:], ns_schedule)

    d = d_ref[:]                          # (1, N)
    r2mp = d[:, :, None] * r_f            # un-flip rows
    j2m = d * jm_f
    sgn = d[:, :, None] * d[:, None, :]   # (1, N, N)
    r2pm = sgn * r2mp
    t2mm = sgn * t2

    c_rmp = cr_mp_ref[:]
    c_rpm = cr_pm_ref[:]
    c_tpp = ct_pp_ref[:]
    c_tmm = ct_mm_ref[:]
    c_jp = cjp_ref[:]
    c_jm = cjm_ref[:]

    n = r2mp.shape[-1]
    eye = jnp.eye(n, dtype=r2mp.dtype)[None]

    # --- 2. interaction (lane-packed; ref interaction.jl:69-117) ---
    a1 = eye - mm(r2mp, c_rpm)
    w1 = mm(r2mp, jnp.concatenate([c_tpp, c_jp[..., None]], axis=-1))
    v1 = w1[..., n] + j2m
    o1 = mm(c_tmm, mm(ns_m(mm, a1, ni), jnp.concatenate(
        [w1[..., :n], t2mm, v1[..., None]], axis=-1)))
    or_mp[:] = c_rmp + o1[..., :n]
    ot_mm[:] = o1[..., n:2 * n]
    ojm[:] = c_jm + o1[..., 2 * n]

    a2 = eye - mm(c_rpm, r2mp)
    w2 = mm(c_rpm, jnp.concatenate([t2mm, j2m[..., None]], axis=-1))
    v2 = c_jp + w2[..., n]
    o2 = mm(t2, mm(ns_m(mm, a2, ni), jnp.concatenate(
        [c_tpp, w2[..., :n], v2[..., None]], axis=-1)))
    ot_pp[:] = o2[..., :n]
    or_pm[:] = r2pm + o2[..., n:2 * n]
    ojp[:] = jp2 + o2[..., 2 * n]


@functools.partial(jax.jit, static_argnames=("ns_schedule", "ni", "block_s",
                                             "interpret", "precision_name"))
def fused_layer_step(comp, r_f, t, jp, jm_f, ek, d_vec, *,
                     ns_schedule: tuple, ni: int = 4, block_s: int = 16,
                     interpret: bool = False,
                     precision_name: str = "highest"):
    """One RT layer step: double the elemental (flipped-space) layer and
    compose it under the composite. comp is a LayerRT pytree; r_f/t:
    (nSpec, N, N); jp/jm_f: (nSpec, N); ek: (nSpec,); d_vec: (N,).
    Returns the new composite LayerRT."""
    from vsmartmom.core.rt import LayerRT

    n_spec, n, _ = r_f.shape
    pad = (-n_spec) % block_s
    mats = [comp.r_mp, comp.r_pm, comp.t_pp, comp.t_mm]
    vecs = [comp.j_p, comp.j_m]
    amats = [r_f, t]
    avecs = [jp, jm_f]
    if pad:
        # padded points: comp.t = I, everything else 0 -> inert solves
        zm = [(0, pad), (0, 0), (0, 0)]
        zv = [(0, pad), (0, 0)]
        eye_pad = np.zeros((pad, n, n), r_f.dtype)
        eye_pad[:] = np.eye(n, dtype=r_f.dtype)
        mats = [jnp.pad(comp.r_mp, zm), jnp.pad(comp.r_pm, zm),
                jnp.concatenate([comp.t_pp, eye_pad]),
                jnp.concatenate([comp.t_mm, eye_pad])]
        vecs = [jnp.pad(v, zv) for v in vecs]
        amats = [jnp.pad(m, zm) for m in amats]
        avecs = [jnp.pad(v, zv) for v in avecs]
        ek = jnp.pad(ek, [(0, pad)])
    n_pad = n_spec + pad
    precision = {"highest": lax.Precision.HIGHEST,
                 "high": "bf16x3",       # Mosaic can't lower HIGH; see batch_mm
                 "default": lax.Precision.DEFAULT}[precision_name]
    ek2 = ek.reshape(n_pad, 1)
    d2 = jnp.asarray(d_vec, r_f.dtype).reshape(1, n)

    grid = (n_pad // block_s,)
    mat_spec = pl.BlockSpec((block_s, n, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((block_s, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ek_spec = pl.BlockSpec((block_s, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, n), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    kern = functools.partial(_layer_step_kernel,
                             ns_schedule=tuple(ns_schedule), ni=ni,
                             precision=precision)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024)
    mshape = jax.ShapeDtypeStruct((n_pad, n, n), r_f.dtype)
    vshape = jax.ShapeDtypeStruct((n_pad, n), r_f.dtype)
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
        out = [o[:n_spec] for o in out]
    return LayerRT(r_mp=out[0], r_pm=out[1], t_pp=out[2], t_mm=out[3],
                   j_p=out[4], j_m=out[5])
