"""Multi-chip sharding dryrun as a regression test (8 virtual CPU
devices; the driver runs the same entry separately)."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_mesh_helpers():
    import numpy as np
    from macaque_tpu.core.mesh import make_mesh, shard_over, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(8, cam_axis_size=2)
    assert mesh.devices.shape == (2, 4)
    s = shard_over(mesh, "cam", "frame")
    x = jax.device_put(np.zeros((4, 8, 3)), s)
    assert x.sharding == s
    r = replicate(mesh)
    y = jax.device_put(np.zeros((5,)), r)
    assert y.sharding.is_fully_replicated
