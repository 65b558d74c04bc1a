"""SE(3)/SO(3) Lie-group operations in JAX.

TPU-native replacement for the reference's Sophus usage
(``/root/reference/src/basics/eigen_funcs.cpp:36-55``) and OpenCV Rodrigues
(``/root/reference/src/vo/vo.cpp:252,326``) plus the cv::Mat SE3 helpers in
``/root/reference/src/basics/opencv_funcs.cpp:41-190`` (convertRt2T,
getRtFromT, invRt, transCoord, skew, ...).

All functions are pure jnp, broadcast over leading batch dims where noted,
and numerically safe around the identity (Taylor fallbacks), so they are
usable inside jit/vmap/grad and as BA retractions.

Conventions
-----------
- ``T`` is a 4x4 homogeneous transform; ``T_w_c`` maps camera-frame points
  to world frame (same convention as the reference's ``Frame::T_w_c_``,
  ``/root/reference/include/my_slam/vo/frame.h``).
- ``se(3)`` twists are ``[rho(3), phi(3)]`` = (translation part, rotation
  part), matching Sophus' ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x of a 3-vector (batched over leading dims).

    Mirrors ``skew`` in the reference (opencv_funcs.cpp).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: axis-angle 3-vector -> rotation matrix.

    Replaces ``cv::Rodrigues`` (vec->mat direction). Batched.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback near 0.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector (batched).

    Replaces ``cv::Rodrigues`` (mat->vec direction). Accurate for angles in
    [0, pi); at exactly pi the axis sign is arbitrary (as in OpenCV).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(sin_t == 0, 1.0, sin_t))
    log_generic = w * scale[..., None]
    # Near pi: use the diagonal formula  axis_i = sqrt((R_ii+1)/2).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0))
    # Fix signs from off-diagonal sums (R + R^T)/2 off-diagonals = axis_i*axis_j*(1-cos).
    sym = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    sx = jnp.ones_like(axis_abs[..., 0])
    sy = jnp.where(sym[..., 0, 1] >= 0, 1.0, -1.0)
    sz = jnp.where(sym[..., 0, 2] >= 0, 1.0, -1.0)
    # If x-component is tiny, anchor signs on y instead.
    x_tiny = axis_abs[..., 0] < 1e-3
    sz = jnp.where(x_tiny, jnp.where(sym[..., 1, 2] >= 0, 1.0, -1.0), sz)
    axis = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    log_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], log_pi, log_generic)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Alias of :func:`so3_exp` (OpenCV naming)."""
    return so3_exp(rvec)


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3); V matrix used by se3_exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta + _EPS * _EPS),
    )
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.where(jnp.sin(half) == 0, 1.0, jnp.sin(half)))
                    / (theta2 + _EPS * _EPS))
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [rho, phi] -> 4x4 transform (batched).

    Replaces Sophus::SE3::exp.  Used as the BA pose retraction.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return rt_to_T(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform -> se(3) twist [rho, phi] (batched). Inverse of se3_exp."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    Vinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_T(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack (R, t) into 4x4 T. Mirrors ``convertRt2T`` (opencv_funcs.cpp)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def T_to_rt(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unpack 4x4 T -> (R, t). Mirrors ``getRtFromT``."""
    return T[..., :3, :3], T[..., :3, 3]


def T_to_rt34(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 -> 3x4 [R|t]. Mirrors ``convertRt2T_3x4``."""
    return T[..., :3, :]


def inv_T(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse. Mirrors ``invRt`` (opencv_funcs.cpp)."""
    R, t = T_to_rt(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply T (..., 4, 4) to points (..., N, 3) -> (..., N, 3).

    Mirrors ``transCoord`` / ``preTranslatePoint3f``.
    """
    R, t = T_to_rt(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def relative_T(T_w_a: jnp.ndarray, T_w_b: jnp.ndarray) -> jnp.ndarray:
    """T_a_b = T_w_a^-1 @ T_w_b.

    Mirrors ``getMotionFromFrame1to2`` (/root/reference/src/vo/vo_commons.cpp:9-20).
    """
    return inv_T(T_w_a) @ T_w_b


def project_onto_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix to M (det +1) via SVD — used to re-orthogonalise
    rotations extracted from linear solves (DLT PnP, H decompose)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def angle_between(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Angle in radians between two vectors (batched). Mirrors
    ``calcAngleBetweenTwoVectors`` (opencv_funcs.cpp)."""
    num = jnp.sum(v1 * v2, axis=-1)
    den = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    return jnp.arccos(jnp.clip(num / (den + _EPS), -1.0, 1.0))


def pose_distance(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Translation distance between two poses — the reference's keyframe /
    jump-rejection metric (``calcMatNorm`` of t_rel, vo.cpp:254-264, 363-369)."""
    return jnp.linalg.norm(T_a[..., :3, 3] - T_b[..., :3, 3], axis=-1)
