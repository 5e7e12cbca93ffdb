"""Fused Pallas TPU kernel for the doubling recursion.

Motivation (measured on TPU, 20k spectral points, N=64, 8 doublings): the
XLA path lowers every batched matmul of the doubling loop to a separate
HBM-roundtripping op — ~7 matrix matmuls x 8 steps x ~1 GB of traffic per
layer puts the RT core at ~6% of the MXU roofline. This kernel keeps the
entire per-layer doubling state (r, t, J+, J-, exp(-dtau/mu0)) resident in
VMEM across all doubling steps and Newton-Schulz iterations, reducing HBM
traffic per layer from ~55 GB to ~1.3 GB (read elemental + write doubled).

The recursion is identical to core.rt.doubling (flipped-space algebra,
ref: src/CoreRT/CoreKernel/doubling.jl:43-68) with the scheduled
Newton-Schulz solve of core.rt.ns_doubling_schedule; both the step count
and the per-step iteration counts are static (host-computed), so the loop
is fully unrolled inside the kernel.

Not differentiable — the XLA path in core.rt remains the AD route; use
this kernel for forward production runs (rt_run_band selects it on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BATCH_MM = (((2,), (1,)), ((0,), (0,)))   # (S,N,N) @ (S,N,N) -> (S,N,N)
_BATCH_MV = (((2,), (1,)), ((0,), (0,)))   # (S,N,N) @ (S,N)   -> (S,N)


def batch_mm(precision):
    """(S,N,N) @ (S,N,K) batched matmul for use inside Pallas kernels.

    precision: lax.Precision.HIGHEST/DEFAULT, or the string "bf16x3" —
    Mosaic does not lower Precision.HIGH, so the 3-pass error-compensated
    bf16 decomposition (a_hi b_hi + a_hi b_lo + a_lo b_hi, f32
    accumulation; the same scheme XLA's HIGH uses) is built by hand. ~2x
    the MXU throughput of HIGHEST (6 passes) at near-f32 accuracy: the
    dropped a_lo b_lo term is O(2^-32) relative.
    """
    if precision == "bf16x3":
        def mm(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = lambda x, y: lax.dot_general(
                x, y, _BATCH_MM, preferred_element_type=jnp.float32,
                precision=lax.Precision.DEFAULT)
            return d(ah, bl) + d(al, bh) + d(ah, bh)
        return mm
    return lambda a, b: lax.dot_general(a, b, _BATCH_MM,
                                        preferred_element_type=a.dtype,
                                        precision=precision)


def doubling_body(mm, r, t, jp, jm, ek, ns_schedule):
    """Shared VMEM doubling recursion (used by the doubling-only and the
    fused layer-step kernels). ek: (S, 1)."""
    n = r.shape[-1]
    eye = jnp.eye(n, dtype=r.dtype)[None]

    for it in ns_schedule:
        # Newton-Schulz right-inverse of A = I - r r: M <- M (2I - A M),
        # M0 = I + r r; residual (r r)^(2^(it+1)).
        #
        # MXU lane packing: every matmul here is (S, n, n) @ (S, n, k) with
        # n ~ 44 — padded to 128 output lanes, so a pass with k = n wastes
        # 2/3 of the array and a matvec (k = 1) wastes 127/128 at the SAME
        # cost as k = n. We therefore concatenate every right-hand operand
        # that shares a left matrix into one pass:
        #   r @ [t | jp | j1m]                (k = n+2, also yields r t)
        #   m @ [rt | t | v1 | v2]            (k = 2n+2 <= 128 for n <= 63)
        #   t @ (that)                        (k = 2n+2)
        # tt = t (I - r r)^{-1} is never materialized: every use is
        # tt @ X = t @ (m @ X). Passes per step drop from 9+2it to 5+2it,
        # and each computes the same dot products (bitwise-equal columns).
        a = eye - mm(r, r)
        m = 2.0 * eye - a               # = I + r r, same fp as the XLA path
        for _ in range(it):
            m = mm(m, 2.0 * eye - mm(a, m))
        j1p = jp * ek
        j1m = jm * ek
        pack1 = jnp.concatenate(
            [t, jp[..., None], j1m[..., None]], axis=-1)
        rp = mm(r, pack1)               # [r t | r jp | r j1m]
        v1 = j1m + rp[..., n]           # j1m + r jp
        v2 = jp + rp[..., n + 1]        # jp  + r j1m
        pack2 = jnp.concatenate(
            [rp[..., :n], t, v1[..., None], v2[..., None]], axis=-1)
        tp = mm(t, mm(m, pack2))        # tt @ [r t | t | v1 | v2]
        jm = jm + tp[..., 2 * n]
        jp = j1p + tp[..., 2 * n + 1]
        r = r + tp[..., :n]
        t = tp[..., n:2 * n]
        ek = ek * ek

    return r, t, jp, jm


def _doubling_kernel(r_ref, t_ref, jp_ref, jm_ref, ek_ref,
                     r_out, t_out, jp_out, jm_out,
                     *, ns_schedule, precision):
    mm = batch_mm(precision)
    r, t, jp, jm = doubling_body(mm, r_ref[:], t_ref[:], jp_ref[:],
                                 jm_ref[:], ek_ref[:], ns_schedule)
    r_out[:] = r
    t_out[:] = t
    jp_out[:] = jp
    jm_out[:] = jm


@functools.partial(jax.jit, static_argnames=("ns_schedule", "block_s",
                                             "interpret", "precision_name"))
def fused_doubling(r, t, jp, jm, ek, *, ns_schedule: tuple,
                   block_s: int = 16, interpret: bool = False,
                   precision_name: str = "highest"):
    """Run all doubling steps in one Pallas kernel, state held in VMEM.

    r, t: (nSpec, N, N); jp, jm: (nSpec, N); ek: (nSpec,).
    ns_schedule: per-step Newton-Schulz iteration counts (len = ndoubl).
    nSpec must be a multiple of block_s (pad upstream).
    Returns the doubled (r, t, jp, jm).
    """
    n_spec, n, _ = r.shape
    pad = (-n_spec) % block_s
    if pad:
        # zero-padded spectral points are inert: r = t = 0 keeps every
        # solve nonsingular (A = I) and all updates at zero
        zm = [(0, pad), (0, 0), (0, 0)]
        zv = [(0, pad), (0, 0)]
        r = jnp.pad(r, zm)
        t = jnp.pad(t, zm)
        jp = jnp.pad(jp, zv)
        jm = jnp.pad(jm, zv)
        ek = jnp.pad(ek, [(0, pad)])
    n_pad = n_spec + pad
    precision = {"highest": lax.Precision.HIGHEST,
                 "high": "bf16x3",       # Mosaic can't lower HIGH; see batch_mm
                 "default": lax.Precision.DEFAULT}[precision_name]
    ek2 = ek.reshape(n_pad, 1)

    grid = (n_pad // block_s,)
    mat_spec = pl.BlockSpec((block_s, n, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((block_s, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ek_spec = pl.BlockSpec((block_s, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    kern = functools.partial(_doubling_kernel, ns_schedule=tuple(ns_schedule),
                             precision=precision)
    kwargs = {}
    if not interpret:
        # lane padding (N -> 128) inflates VMEM footprints ~3x for N~44;
        # allow more scoped VMEM than the 16 MB default
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec, ek_spec],
        out_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct(r.shape, r.dtype),
                   jax.ShapeDtypeStruct(t.shape, t.dtype),
                   jax.ShapeDtypeStruct(jp.shape, jp.dtype),
                   jax.ShapeDtypeStruct(jm.shape, jm.dtype)],
        interpret=interpret,
        **kwargs,
    )(r, t, jp, jm, ek2)
    if pad:
        out = [o[:n_spec] for o in out]
    return tuple(out)
