"""Test configuration: run on CPU in float64 with a virtual 8-device mesh.

Accuracy gates (6SV1 / Natraj / HAPI) need float64; TPU hardware runs are
exercised separately by bench.py. The 8 virtual CPU devices let sharding
tests validate the multi-chip path without TPU pods.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)
