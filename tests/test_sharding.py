"""Multi-chip (spectral sharding) gates on the virtual 8-device CPU mesh.

The wavelength axis is the framework's parallelism strategy (SURVEY §5.8):
the elastic path shards with zero collectives; the Raman path's
cross-wavelength rolls lower to XLA collective permutes across shard
boundaries. Gate: sharded == single-device to near machine precision.
(The reference is single-GPU only — this capability is new.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vsmartmom.core.rt_run import BandRTInputs, rt_run_band
from vsmartmom.parallel.sharding import SPECTRAL_AXIS, spectral_mesh
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams


def _band(n_z=3, n_spec=32, seed=0):
    rng = np.random.default_rng(seed)
    tau_scat = np.full((n_z, n_spec), 0.1)
    tau_abs = rng.uniform(0.0, 0.5, (n_z, n_spec))
    tau = tau_scat + tau_abs
    return BandRTInputs(tau=tau, omega=tau_scat / tau,
                        zw=np.ones((n_z, 1, n_spec)),
                        greeks=[get_greek_rayleigh(0.028)])


def test_elastic_sharded_matches_single():
    """Full polarized rt_run with nSpec sharded over 8 devices == local."""
    pol = Polarization.from_name("Stokes_IQU")
    quad = rt_set_streams("GaussQuadFullSphere", 10, 45.0, [0.0, 30.0],
                          pol.n)
    band = _band()
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.2}

    R_ref, T_ref = rt_run_band(pol, quad, band, [0.0, 30.0], [0.0, 90.0],
                               3, surf)

    mesh = spectral_mesh(8)
    sh = NamedSharding(mesh, P(None, SPECTRAL_AXIS))
    band_sh = BandRTInputs(
        tau=jax.device_put(jnp.asarray(band.tau), sh),
        omega=jax.device_put(jnp.asarray(band.omega), sh),
        zw=jax.device_put(jnp.asarray(band.zw),
                          NamedSharding(mesh, P(None, None, SPECTRAL_AXIS))),
        greeks=band.greeks)
    with mesh:
        R_sh, T_sh = rt_run_band(pol, quad, band_sh, [0.0, 30.0],
                                 [0.0, 90.0], 3, surf)
    np.testing.assert_allclose(R_sh, R_ref, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(T_sh, T_ref, rtol=1e-12, atol=1e-15)


def test_raman_sharded_matches_single():
    """RRS coupling crosses shard boundaries (the rolls become collective
    permutes over the mesh) — sharded must equal single-device."""
    from vsmartmom.core.rt_raman import rt_run_band_rrs
    from vsmartmom.inelastic.rrs import RRS, greek_raman_coefs

    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 8, 45.0, [0.0], pol.n)
    n_spec = 32
    band = _band(n_spec=n_spec, seed=3)
    # synthetic coupling whose shifts (5, 9) straddle the 4-point shards
    rrs = RRS(i_shift=np.array([-9, -5, 5, 9]),
              w_shift=np.array([0.01, 0.02, 0.02, 0.01]),
              omega_cabannes=0.97,
              greek_raman=greek_raman_coefs(6.0 / 7.0),
              depol_rayl=0.028)
    f_rayl = band.omega * 0.9
    surf = {"type": "LambertianSurfaceScalar", "albedo": 0.1}

    ref = rt_run_band_rrs(pol, quad, band, rrs, f_rayl, [0.0], [0.0], 2,
                          surf)

    mesh = spectral_mesh(8)
    sh = NamedSharding(mesh, P(None, SPECTRAL_AXIS))
    band_sh = BandRTInputs(
        tau=jax.device_put(jnp.asarray(band.tau), sh),
        omega=jax.device_put(jnp.asarray(band.omega), sh),
        zw=jax.device_put(jnp.asarray(band.zw),
                          NamedSharding(mesh, P(None, None, SPECTRAL_AXIS))),
        greeks=band.greeks)
    with mesh:
        got = rt_run_band_rrs(pol, quad, band_sh, rrs,
                              jax.device_put(jnp.asarray(f_rayl), sh),
                              [0.0], [0.0], 2, surf)
    for a, b, name in zip(got, ref, ("R", "T", "ieR", "ieT")):
        np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-16,
                                   err_msg=name)
