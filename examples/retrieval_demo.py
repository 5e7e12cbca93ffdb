"""Gauss-Newton retrieval demo: recover (AOD scaling, surface albedo, gas
scaling) from synthetic radiances with jacfwd Jacobians.

Mirrors the reference's OCO-2 linearization prototype
(ref: test/prototyping/AD_OCO2_test.jl:71-160) with a synthetic truth in
place of the L1b granule (no instrument data ships with either repo).

Run: python examples/retrieval_demo.py
"""
import numpy as np

import jax
import jax.numpy as jnp

try:
    _backend = jax.default_backend()
except RuntimeError:           # accelerator busy/unavailable -> CPU
    jax.config.update("jax_platforms", "cpu")
    _backend = "cpu"
if _backend == "cpu":
    jax.config.update("jax_enable_x64", True)

from vsmartmom.core.autodiff import gauss_newton, make_radiance_fn
from vsmartmom.scattering.phase import Polarization, get_greek_rayleigh
from vsmartmom.util.quadrature import rt_set_streams
from vsmartmom.util.timing import print_timer


def main():
    n_z, n_spec = 5, 64
    pol = Polarization.from_name("Stokes_I")
    quad = rt_set_streams("GaussQuadFullSphere", 12, 40.0, [0.0, 30.0],
                          pol.n)
    fn = make_radiance_fn(pol, quad, [get_greek_rayleigh(0.028)],
                          [0.0, 30.0], [0.0, 90.0], 3, n_z, n_spec)

    rng = np.random.default_rng(0)
    tau_scat = np.full((n_z, n_spec), 0.05)
    tau_abs0 = rng.uniform(0.05, 0.8, (n_z, n_spec))

    def forward(x):
        """State: [log AOD-like scaling, albedo, log gas scaling]."""
        tau = (jnp.asarray(tau_scat) * jnp.exp(x[0])
               + jnp.asarray(tau_abs0) * jnp.exp(x[2]))
        omega = jnp.asarray(tau_scat) * jnp.exp(x[0]) / tau
        zw = jnp.ones((n_z, 1, n_spec))
        return fn(tau, omega, zw, x[1]).ravel()

    x_true = jnp.array([0.3, 0.25, -0.1])
    y_meas = forward(x_true)
    y_noisy = y_meas * (1.0 + 1e-5 * rng.standard_normal(y_meas.shape))

    x_hat, hist = gauss_newton(lambda x: forward(x) - y_noisy,
                               jnp.array([0.0, 0.1, 0.0]), n_iter=6)
    print("truth:    ", np.asarray(x_true))
    print("retrieved:", np.asarray(x_hat))
    print("chi2 history:", [f"{h:.3e}" for h in hist])
    print_timer()
    assert np.allclose(np.asarray(x_hat), np.asarray(x_true), atol=1e-3)
    print("retrieval OK")


if __name__ == "__main__":
    main()
