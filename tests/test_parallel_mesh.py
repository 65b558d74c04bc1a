"""Mesh helper tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from monocular_visual_odometry_tpu.parallel import mesh as M


def test_points_mesh_all_devices():
    m = M.points_mesh()
    assert m.devices.size == 8
    assert m.axis_names == (M.POINTS_AXIS,)


def test_points_mesh_subset():
    m = M.points_mesh(4)
    assert m.devices.size == 4


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("MVO_COORDINATOR", raising=False)
    M.init_distributed()  # must not raise or hang


def test_sharding_specs():
    m = M.points_mesh()
    import jax.numpy as jnp

    x = jnp.zeros((64, 3))
    xs = jax.device_put(x, M.points_sharded(m))
    assert len(xs.sharding.device_set) == 8
    xr = jax.device_put(x, M.replicated(m))
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xr))
