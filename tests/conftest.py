"""Test configuration: run on CPU in float64 with a virtual 8-device mesh.

Accuracy gates (6SV1 / Natraj / HAPI) need float64; TPU hardware runs are
exercised separately by bench.py. The 8 virtual CPU devices let sharding
tests validate the multi-chip path without TPU pods.
"""
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the live compiled-program set: with the full suite in one
    process, XLA:CPU segfaulted (deterministically) while compiling the
    first NamedSharding program after ~130 accumulated compilations
    (jax 0.9.0, 8 virtual devices). Dropping caches between modules keeps
    the compiler's live set small; per-module recompiles cost seconds."""
    yield
    jax.clear_caches()
