"""Lower-boundary (surface) layers as LayerRT slabs.

ref: src/CoreRT/Surfaces/lambertian_surface.jl (Lambertian scalar / Legendre);
RPV and Ross-Li BRDFs follow in core/brdf.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from vsmartmom.core.rt import LayerRT


def lambertian_surface_layer(albedo, n_spec, n_stokes, qp, wt, i0_vec,
                             tau_sum, mu0, is_m0, dtype,
                             spectral_albedo=None) -> LayerRT:
    """Lambertian surface as an added layer.

    ref: src/CoreRT/Surfaces/lambertian_surface.jl:20-75. Only the m == 0
    Fourier moment reflects (isotropic surface); higher moments are pure
    identity transmission.

    ``spectral_albedo``: optional (nSpec,) array overriding the scalar albedo
    per wavelength (used for spectral/Legendre surface types).
    """
    n = qp.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (n_spec, n, n))
    zero_m = jnp.zeros((n_spec, n, n), dtype)
    zero_v = jnp.zeros((n_spec, n), dtype)
    if not is_m0:
        return LayerRT(zero_m, zero_m, eye, eye, zero_v, zero_v)

    # rho = 2 * albedo for the 0th Fourier moment; reflection couples only the
    # intensity (I) components of every stream pair.
    idx = jnp.arange(n)
    is_i_comp = (idx % n_stokes) == 0
    ones_block = jnp.outer(is_i_comp.astype(dtype), is_i_comp.astype(dtype))

    if spectral_albedo is not None:
        rho = (2.0 * spectral_albedo)[:, None, None]    # (nSpec,1,1)
    else:
        rho = 2.0 * albedo
    r_surf_pre = rho * ones_block                        # pre-weighting
    atten = jnp.exp(-tau_sum / mu0)[:, None]

    j_p = jnp.broadcast_to(i0_vec, (n_spec, n)) * atten
    r_i0 = jnp.sum(jnp.broadcast_to(r_surf_pre, (n_spec, n, n))
                   * i0_vec[None, None, :], axis=-1)
    j_m = mu0 * r_i0 * atten

    r_mp = r_surf_pre * (qp * wt)[None, None, :]
    r_mp = jnp.broadcast_to(r_mp, (n_spec, n, n))
    return LayerRT(r_mp=r_mp, r_pm=zero_m, t_pp=eye, t_mm=eye,
                   j_p=j_p, j_m=j_m)


def brdf_surface_layer(rho_pre, n_spec, qp, wt, i0_vec, tau_sum, mu0,
                       dtype) -> LayerRT:
    """Generic BRDF surface as an added layer, from the pre-weight Fourier
    reflection matrix rho_pre (N, N) of the current moment m.

    r^-+ = rho_pre diag(qp wt); SFI sources use the unweighted matrix at the
    solar node (ref: Surfaces/rpv_surface.jl create_surface_layer!:28-64).
    Unlike a Lambertian, BRDF moments m > 0 are generally nonzero.
    """
    n = qp.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (n_spec, n, n))
    zero_m = jnp.zeros((n_spec, n, n), dtype)
    rho_pre = jnp.asarray(rho_pre, dtype)
    atten = jnp.exp(-tau_sum / mu0)[:, None]

    j_p = jnp.broadcast_to(i0_vec, (n_spec, n)) * atten
    j_m = mu0 * (rho_pre @ i0_vec)[None, :] * atten

    r_mp = jnp.broadcast_to(rho_pre * (qp * wt)[None, :], (n_spec, n, n))
    return LayerRT(r_mp=r_mp, r_pm=zero_m, t_pp=eye, t_mm=eye,
                   j_p=j_p, j_m=j_m)
