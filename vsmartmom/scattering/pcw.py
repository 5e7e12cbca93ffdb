"""PCW (Domke) aerosol decomposition: Greek coefficients directly from
Wigner-3j pair sums (Sanghavi 2014 eqs. 22-24).

Independent of the NAI2 route — the two must agree (this is the reference's
NAI2-vs-PCW cross-implementation gate, test/test_Scattering.jl:68-124).
Fully vectorized over (m, n, l) with einsum instead of the reference's
triple scalar loop (ref: src/Scattering/compute_PCW.jl:16-192).
"""
from __future__ import annotations

import numpy as np

from vsmartmom.scattering.mie import (compute_mie_ab_batch, cross_sections,
                                      get_n_max, size_distribution_weights)
from vsmartmom.scattering.nai2 import AerosolOptics, _aerosol_from_spec
from vsmartmom.scattering.phase import GreekCoefs
from vsmartmom.util.quadrature import gauleg


def _pair_mats(an, bn, wx):
    """Size-distribution-averaged coefficient products
    M_xy[m, n] = sum_i wx[i] conj(x_n) y_m  (ref: mie_helper_functions.jl:
    compute_avg_anbns!; an/bn are already truncated per radius)."""
    # (nr, N) arrays -> (N_m, N_n)
    anam = np.einsum("i,in,im->mn", wx, np.conj(an), an)
    anbm = np.einsum("i,in,im->mn", wx, np.conj(an), bn)
    bnam = np.einsum("i,in,im->mn", wx, np.conj(bn), an)
    bnbm = np.einsum("i,in,im->mn", wx, np.conj(bn), bn)
    return anam, anbm, bnam, bnbm


def compute_aerosol_optical_properties_pcw(spec, lam: float, r_max: float,
                                           nquad_radius: int,
                                           wigner_A=None, wigner_B=None,
                                           n_ref: complex = None
                                           ) -> AerosolOptics:
    """Greek coefficients via the precomputed-Wigner route.

    wigner_A/B: tables from `compute_wigner_values` with
    m_max >= N_max, n_max >= N_max, l_max >= 2 N_max - 1 (built on demand
    when omitted). ref: compute_PCW.jl:16-118.
    """
    aero = _aerosol_from_spec(spec)
    r, w_r = gauleg(nquad_radius, 0.0, r_max)
    w_r = w_r / w_r.sum()
    k = 2.0 * np.pi / lam
    x = k * r
    n_max = get_n_max(x.max())
    m_refr = n_ref if n_ref is not None else complex(aero.n_r, aero.n_i)
    m_refr = complex(m_refr.real, abs(m_refr.imag))

    an, bn = compute_mie_ab_batch(x, m_refr, n_max)
    c_sca, c_ext = cross_sections(an, bn, k)
    wx = size_distribution_weights(aero, w_r, r)
    avg_c_sca = float(np.sum(wx * c_sca))
    avg_c_ext = float(np.sum(wx * c_ext))

    l_max = 2 * n_max - 1
    if wigner_A is None or wigner_B is None:
        from vsmartmom.scattering.wigner import compute_wigner_values
        wigner_A, wigner_B = compute_wigner_values(n_max, n_max, l_max)
    assert wigner_A.shape[0] >= n_max and wigner_A.shape[1] >= n_max \
        and wigner_A.shape[2] >= l_max, "Wigner tables too small"

    # Slice tables to (m=1..N, n=1..N, l=0..l_max-1)
    wa = wigner_A[:n_max, :n_max, :l_max]
    wb = wigner_B[:n_max, :n_max, :l_max]

    anam, anbm, bnam, bnbm = _pair_mats(an, bn, wx)
    nvec = np.arange(1, n_max + 1, dtype=np.float64)
    two_np1 = 2.0 * nvec + 1.0                             # (N,)
    an_m_bn = np.einsum("i,in->n", wx, np.abs(an - bn) ** 2)
    an_p_bn = np.einsum("i,in->n", wx, np.abs(an + bn) ** 2)

    # Off-diagonal weights: strictly m > n (the reference's m-loop starts at
    # n+1 and multiplies by 2 for the transposed partner).
    mgt = (np.arange(1, n_max + 1)[:, None]
           > np.arange(1, n_max + 1)[None, :])             # (m, n) mask
    ls = np.arange(l_max)
    # parity (-1)^(l + n + m) as (m, n, l) tensor
    par = np.where((ls[None, None, :]
                    + np.arange(1, n_max + 1)[:, None, None]
                    + np.arange(1, n_max + 1)[None, :, None]) % 2 == 0,
                   1.0, -1.0)
    cmn = 2.0 * np.outer(two_np1, two_np1) * mgt           # 2(2m+1)(2n+1)

    re_sum = np.real(anam + anbm + bnam + bnbm)            # (m, n)
    re_dif = np.real(anam - anbm - bnam + bnbm)

    # First terms, all l at once
    first_00 = np.einsum("mn,mnl->l", cmn * re_sum, wa * wa)
    first_0m0 = np.einsum("mn,mnl->l", cmn * re_dif, par * wa * wa)
    first_22 = np.einsum("mn,mnl->l", cmn * re_sum, wb * wb)
    first_2m2 = np.einsum("mn,mnl->l", cmn * re_dif, par * wb * wb)
    avg02 = par * (anam + bnam - anbm - bnbm)[:, :, None] \
        + np.conj(anam - bnam + anbm - bnbm)[:, :, None]
    first_02 = np.einsum("mnl,mnl->l", cmn[:, :, None] * avg02, wa * wb)

    # Second (diagonal) terms
    dwa = np.einsum("nnl->nl", wa)                          # (N, l)
    dwb = np.einsum("nnl->nl", wb)
    parl = np.where(ls % 2 == 0, 1.0, -1.0)
    second_00 = np.einsum("n,nl->l", two_np1**2 * an_p_bn, dwa * dwa)
    second_0m0 = parl * np.einsum("n,nl->l", two_np1**2 * an_m_bn, dwa * dwa)
    second_22 = np.einsum("n,nl->l", two_np1**2 * an_p_bn, dwb * dwb)
    second_2m2 = parl * np.einsum("n,nl->l", two_np1**2 * an_m_bn, dwb * dwb)
    diag_avg = np.einsum("nn->n", anam - anbm + bnam - bnbm)
    second_02 = np.einsum("n,nl->l", 2.0 * two_np1**2 * diag_avg, dwa * dwb)

    coef = (2.0 * ls + 1.0) * np.pi / k**2 / avg_c_sca
    sl_00 = coef * (first_00 + second_00)
    sl_0m0 = coef * (first_0m0 + second_0m0)
    sl_22 = coef * (first_22 + second_22)
    sl_2m2 = coef * (first_2m2 + second_2m2)
    sl_02 = coef * (first_02 + second_02)

    gc = GreekCoefs(alpha=sl_22 + sl_2m2, beta=sl_00 + sl_0m0,
                    gamma=np.real(sl_02), delta=sl_00 - sl_0m0,
                    epsilon=np.imag(sl_02), zeta=sl_22 - sl_2m2)
    return AerosolOptics(greek_coefs=gc, ssa=avg_c_sca / avg_c_ext,
                         k=avg_c_ext, f_t=1.0)
