"""Multi-host scaffolding gates (virtual 8-device CPU mesh).

The reference has no distribution at all (SURVEY §5.8); these validate the
new jax.distributed helpers: mesh construction over global devices,
per-process spectral slicing, and the scaling harness mechanics.
Real N-host scaling numbers come from tools/scaling_bench.py on a pod.
"""
import numpy as np

import jax

from vsmartmom.parallel import distributed as dist


def test_init_multihost_single_process_noop():
    """Without a coordinator/pod env this stays a 1-process run."""
    assert dist.init_multihost() is False or jax.process_count() > 1


def test_global_spectral_mesh_and_slice():
    mesh = dist.global_spectral_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    lo, hi = dist.process_spectral_slice(64, mesh)
    # single process owns the whole axis
    assert (lo, hi) == (0, 64)


def test_process_slice_divisibility_error():
    mesh = dist.global_spectral_mesh()
    try:
        dist.process_spectral_slice(65, mesh)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_global_spectral_array_sharded():
    mesh = dist.global_spectral_mesh()
    x = np.arange(32.0).reshape(2, 16)
    arr = dist.global_spectral_array(x, mesh, axis=1)
    assert arr.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8


def test_scaling_harness_runs():
    """The weak-scaling harness executes on the virtual mesh and reports
    monotone device counts with finite throughput."""
    import os
    os.environ["SCALING_SPEC_PER_DEV"] = "32"
    import tools.scaling_bench as sb
    sb.SPEC_PER_DEV = 32
    out = sb.main()
    ns = [r["n_devices"] for r in out["rows"]]
    assert ns == [1, 2, 4, 8]
    assert all(r["pts_per_s"] > 0 for r in out["rows"])
    assert all(np.isfinite(r["scaling_efficiency"]) for r in out["rows"])
