"""model_from_parameters: derive all simulation state from RTParameters.

ref: src/CoreRT/tools/model_from_parameters.jl:12-194
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from vsmartmom.config.params import RTParameters
from vsmartmom.core.atmosphere import (AtmosphericProfile,
                                       aerosol_layer_tau_gaussian,
                                       compute_atmos_profile_fields,
                                       rayleigh_layer_tau, reduce_profile)
from vsmartmom.scattering.phase import (GreekCoefs, Polarization,
                                        get_greek_rayleigh)
from vsmartmom.util.quadrature import QuadPoints, rt_set_streams


@dataclasses.dataclass
class ObsGeometry:
    sza: float
    vza: np.ndarray
    vaz: np.ndarray
    obs_alt: float


@dataclasses.dataclass
class RTModel:
    """Derived model state (ref: vSmartMOM_Model, types.jl:478-...).

    tau_abs[i_band]:  (nSpec, nZ) gas absorption optical depth
    tau_rayl[i_band]: (nSpec, nZ) Rayleigh scattering optical depth
    tau_aer[i_band]:  (nAer, nZ) aerosol extinction optical depth
    aerosol_optics[i_band][i_aer]: AerosolOptics (Greek coefs, ssa, k, f_t)
    """
    params: RTParameters
    aerosol_optics: List[list]
    greek_rayleigh: GreekCoefs
    quad_points: QuadPoints
    tau_abs: List[np.ndarray]
    tau_rayl: List[np.ndarray]
    tau_aer: List[np.ndarray]
    obs_geom: ObsGeometry
    profile: AtmosphericProfile
    pol: Polarization

    def __repr__(self):          # ref: show_utils.jl Base.show overload
        from vsmartmom.util.show import describe_model
        return describe_model(self)


def model_from_parameters(params: RTParameters) -> RTModel:
    n_bands = len(params.spec_bands)
    n_aer = (0 if params.scattering_params is None
             else len(params.scattering_params.rt_aerosols))

    obs_geom = ObsGeometry(params.sza, params.vza, params.vaz, params.obs_alt)
    pol = Polarization.from_name(params.polarization_type)
    quad_points = rt_set_streams(params.quadrature_type, params.l_trunc,
                                 params.sza, params.vza, pol.n)

    vmr = ({} if params.absorption_params is None
           else params.absorption_params.vmr)
    profile = compute_atmos_profile_fields(params.T, params.p, params.q, vmr)
    if params.profile_reduction != -1:
        profile = reduce_profile(params.profile_reduction, profile)

    greek_rayleigh = get_greek_rayleigh(params.depol)

    tau_rayl = []
    tau_abs = []
    for i_band, band in enumerate(params.spec_bands):
        lam_um = 1e4 / band
        tau_rayl.append(rayleigh_layer_tau(
            float(profile.p_half[-1]), lam_um, params.depol, profile.vcd_dry))
        ta = np.zeros((len(band), profile.n_layers))
        if params.absorption_params is not None:
            from vsmartmom.spectroscopy.profiles import \
                compute_absorption_profile
            ap = params.absorption_params
            for mol in ap.molecules[i_band]:
                compute_absorption_profile(
                    ta, mol, ap, band, profile.vmr[mol], profile)
        tau_abs.append(ta)

    aerosol_optics = [[None] * n_aer for _ in range(n_bands)]
    tau_aer = [np.zeros((n_aer, profile.n_layers)) for _ in range(n_bands)]
    if n_aer > 0:
        from vsmartmom.scattering.nai2 import (compute_aerosol_optical_properties,
                                               compute_ref_aerosol_extinction)
        from vsmartmom.scattering.truncation import truncate_phase
        sp = params.scattering_params
        for i_aer, aero in enumerate(sp.rt_aerosols):
            k_ref = compute_ref_aerosol_extinction(
                aero, sp.lambda_ref, sp.n_ref, sp.r_max, sp.nquad_radius)
            for i_band, band in enumerate(params.spec_bands):
                lam_um = 1e4 / band
                lam_c = 0.5 * (lam_um.max() + lam_um.min())
                optics_raw = compute_aerosol_optical_properties(
                    aero, lam_c, sp.r_max, sp.nquad_radius, pol)
                optics = truncate_phase(optics_raw, params.l_trunc,
                                        params.delta_angle)
                aerosol_optics[i_band][i_aer] = optics
                if getattr(aero, "profile_type", "gaussian") == "uniform":
                    from vsmartmom.core.atmosphere import \
                        aerosol_layer_tau_uniform
                    vert = aerosol_layer_tau_uniform(1.0, aero.p0, aero.p_hi,
                                                     profile)
                else:
                    vert = aerosol_layer_tau_gaussian(1.0, aero.p0,
                                                      aero.sigma_p, profile)
                tau_aer[i_band][i_aer, :] = (
                    aero.tau_ref * (optics.k / k_ref) * vert)

        # AOD report (ref: model_from_parameters.jl:164 @info)
        from vsmartmom.util.logging import aod_report
        for i_band in range(n_bands):
            aod_report([f"aerosol[{i}]" for i in range(n_aer)],
                       tau_aer[i_band], band_label=f"band {i_band}")

    return RTModel(params=params, aerosol_optics=aerosol_optics,
                   greek_rayleigh=greek_rayleigh, quad_points=quad_points,
                   tau_abs=tau_abs, tau_rayl=tau_rayl, tau_aer=tau_aer,
                   obs_geom=obs_geom, profile=profile, pol=pol)
