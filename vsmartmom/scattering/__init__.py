"""Mie / aerosol scattering (ref: src/Scattering/Scattering.jl exports)."""
from vsmartmom.scattering.mie import (Aerosol, compute_mie_ab_batch,
                                      get_n_max, phase_function,
                                      phase_function_monodisperse)
from vsmartmom.scattering.nai2 import (AerosolOptics,
                                       compute_aerosol_optical_properties,
                                       compute_ref_aerosol_extinction)
from vsmartmom.scattering.pcw import compute_aerosol_optical_properties_pcw
from vsmartmom.scattering.phase import (GreekCoefs, Polarization,
                                        compute_Z_moments,
                                        get_greek_rayleigh)
from vsmartmom.scattering.truncation import reconstruct_phase, truncate_phase
from vsmartmom.scattering.wigner import (compute_wigner_values,
                                         load_wigner_values,
                                         save_wigner_values, wigner3j)

__all__ = [
    "Aerosol", "AerosolOptics", "GreekCoefs", "Polarization",
    "compute_Z_moments", "compute_aerosol_optical_properties",
    "compute_aerosol_optical_properties_pcw", "compute_mie_ab_batch",
    "compute_ref_aerosol_extinction", "compute_wigner_values", "get_n_max",
    "get_greek_rayleigh", "load_wigner_values", "phase_function",
    "phase_function_monodisperse", "reconstruct_phase", "save_wigner_values",
    "truncate_phase", "wigner3j",
]
