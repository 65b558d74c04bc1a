"""Unit tests for SE(3)/SO(3) ops against closed-form cases and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_tpu.ops import lie


def random_rotvecs(n, seed=0, max_angle=3.0):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0.0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_so3_exp_matches_scipy():
    rv = random_rotvecs(64)
    R_ours = np.asarray(lie.so3_exp(jnp.asarray(rv)))
    R_scipy = Rotation.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rv = random_rotvecs(64, max_angle=3.1)
    back = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(rv))))
    np.testing.assert_allclose(back, rv, atol=2e-3)


def test_so3_exp_small_angle():
    rv = np.array([[1e-6, -2e-6, 1e-7], [0, 0, 0]], dtype=np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rv)))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(R[0], Rotation.from_rotvec(rv[0]).as_matrix(), atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    xi = rng.uniform(-1, 1, size=(32, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    back = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_se3_exp_is_rigid():
    xi = jnp.asarray(np.random.default_rng(2).normal(size=(8, 6)), dtype=jnp.float32)
    T = np.asarray(lie.se3_exp(xi))
    for Ti in T:
        R = Ti[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1) < 1e-5
        np.testing.assert_allclose(Ti[3], [0, 0, 0, 1], atol=0)


def test_inv_T():
    xi = jnp.asarray(np.random.default_rng(3).normal(size=(8, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    eye = np.asarray(T @ lie.inv_T(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_relative_T():
    rng = np.random.default_rng(4)
    Ta = lie.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    Tb = lie.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    T_ab = lie.relative_T(Ta, Tb)
    np.testing.assert_allclose(np.asarray(Ta @ T_ab), np.asarray(Tb), atol=1e-5)


def test_transform_points():
    R = Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix().astype(np.float32)
    t = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    T = lie.rt_to_T(jnp.asarray(R), jnp.asarray(t))
    pts = np.random.default_rng(5).normal(size=(17, 3)).astype(np.float32)
    out = np.asarray(lie.transform_points(T, jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)


def test_hat_vee():
    w = jnp.asarray([[1.0, 2.0, 3.0]])
    W = lie.hat(w)
    np.testing.assert_allclose(np.asarray(lie.vee(W)), [[1, 2, 3]], atol=0)
    # W @ v == w x v
    v = jnp.asarray([0.5, -1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(W[0] @ v), np.cross(np.array([1.0, 2, 3]), np.asarray(v)), atol=1e-6
    )


def test_project_onto_so3():
    rng = np.random.default_rng(6)
    R = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    noisy = R + rng.normal(size=(3, 3)) * 0.05
    Rp = np.asarray(lie.project_onto_so3(jnp.asarray(noisy, dtype=jnp.float32)))
    np.testing.assert_allclose(Rp @ Rp.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(Rp) > 0.99
    assert np.abs(Rp - R).max() < 0.1


def test_angle_between():
    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 1.0, 0.0])
    assert abs(float(lie.angle_between(a, b)) - np.pi / 2) < 1e-6


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lie.se3_exp))
    xi = jnp.zeros((4, 6))
    out = f(xi)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-6)
