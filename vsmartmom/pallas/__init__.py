"""Pallas TPU kernels (hot-path custom ops)."""
from vsmartmom.pallas.voigt_kernel import (VoigtPlan, rew_hw32sd,
                                           voigt_xsec_pallas)

__all__ = ["VoigtPlan", "rew_hw32sd", "voigt_xsec_pallas"]
