"""Perspective-n-Point: batched RANSAC + Levenberg-Marquardt polish.

TPU-native replacement for ``cv::solvePnPRansac`` as used by the tracking
stage (``/root/reference/src/vo/vo.cpp:318-320``: 100 iterations, 2 px
reprojection threshold, confidence 0.999).

Formulation: fixed batch of 6-point DLT minimal solves (linear projection-
matrix estimation + SO(3) projection), vectorized reprojection scoring of
all hypotheses against all correspondences, argmax consensus, then a
fixed-iteration Levenberg-Marquardt refinement on the winning inliers with
analytic se(3) Jacobians — the same GN core the windowed BA reuses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_visual_odometry_tpu.ops import lie
from monocular_visual_odometry_tpu.ops.camera import Camera, cam2pixel
from monocular_visual_odometry_tpu.ops.ransac import nullspace_via_eigh, sample_minimal_sets

_EPS = 1e-9


class PnPResult(NamedTuple):
    T_c_w: jnp.ndarray     # [4,4] world -> camera (cv::solvePnP convention)
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray # scalar int32
    ok: jnp.ndarray        # scalar bool — enough inliers to trust the pose


def _dlt_p6(pts: jnp.ndarray, uv_n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched 6-point DLT for the projection matrix on the normalized image
    plane. pts: [..., M, 3] world; uv_n: [..., M, 2] normalized-plane.
    Returns (R [...,3,3], t [...,3])."""
    X, Y, Z = pts[..., 0], pts[..., 1], pts[..., 2]
    u, v = uv_n[..., 0], uv_n[..., 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)            # [..., 2M, 12]
    p = nullspace_via_eigh(A)                          # [..., 12]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :3]
    # scale + orthogonalize: R = proj_SO3(M), s = mean singular value
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[..., None, :]) @ Vt
    scale = jnp.mean(s, axis=-1) * jnp.sign(det)      # det<0 -> flip overall sign
    t = P[..., 3] / (scale[..., None] + jnp.where(scale[..., None] >= 0, _EPS, -_EPS))
    # resolve remaining sign ambiguity by cheirality of the sampled points
    zc = jnp.einsum("...ij,...mj->...mi", R, pts)[..., 2] + t[..., 2][..., None]
    n_pos = jnp.sum(zc > 0, axis=-1)
    flip = n_pos < (pts.shape[-2] - n_pos)
    R = jnp.where(flip[..., None, None], -R, R)
    t = jnp.where(flip[..., None], -t, t)
    # -R is not a rotation (det -1); re-project to SO(3) after flip
    R = jnp.where(flip[..., None, None], _reproject_so3(R), R)
    return R, t


def _reproject_so3(R):
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return (U * D[..., None, :]) @ Vt


def _reproj_err2_px(T_c_w: jnp.ndarray, pts_w: jnp.ndarray, uv: jnp.ndarray,
                    cam: Camera) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Squared pixel reprojection error and camera-frame depth, batched over
    leading dims of T_c_w."""
    p_c = jnp.einsum("...ij,nj->...ni", T_c_w[..., :3, :3], pts_w) + T_c_w[..., None, :3, 3]
    proj = cam2pixel(p_c, cam)
    err2 = jnp.sum((proj - uv) ** 2, axis=-1)
    return err2, p_c[..., 2]


def _gn_refine(T0_c_w: jnp.ndarray, pts_w: jnp.ndarray, uv: jnp.ndarray,
               w: jnp.ndarray, cam: Camera, iterations: int = 10,
               init_lambda: float = 1e-3) -> jnp.ndarray:
    """LM refinement of a single pose over weighted correspondences.

    Left-multiplicative se(3) update: T <- exp(delta) @ T. Analytic 2x6
    Jacobian d(pixel)/d(delta) = dproj/dp @ [I | -hat(p_cam)].
    """

    def cost_and_system(T):
        R, t = lie.T_to_rt(T)
        p = pts_w @ R.T + t                           # [N,3] camera frame
        z = jnp.maximum(p[:, 2], 1e-6)
        u = p[:, 0] / z * cam.fx + cam.cx
        v = p[:, 1] / z * cam.fy + cam.cy
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=-1)   # [N,2]
        inv_z = 1.0 / z
        du_dp = jnp.stack(
            [cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * p[:, 0] * inv_z**2], axis=-1
        )
        dv_dp = jnp.stack(
            [jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * p[:, 1] * inv_z**2], axis=-1
        )
        J_proj = jnp.stack([du_dp, dv_dp], axis=-2)            # [N,2,3]
        dp_ddelta = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), (p.shape[0], 3, 3)),
             -lie.hat(p)], axis=-1
        )                                                       # [N,3,6]
        J = J_proj @ dp_ddelta                                  # [N,2,6]
        Wr = r * w[:, None]
        H = jnp.einsum("nik,nil->kl", J * w[:, None, None], J)
        g = jnp.einsum("nik,ni->k", J, Wr)
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return cost, H, g

    def step(carry, _):
        T, lam = carry
        cost, H, g = cost_and_system(T)
        delta = -jnp.linalg.solve(H + lam * jnp.eye(6, dtype=T.dtype), g)
        T_new = lie.se3_exp(delta) @ T
        cost_new, _, _ = cost_and_system(T_new)
        accept = cost_new < cost
        T = jnp.where(accept, T_new, T)
        lam = jnp.where(accept, lam * 0.3, lam * 3.0)
        return (T, lam), None

    (T, _), _ = jax.lax.scan(
        step, (T0_c_w, jnp.asarray(init_lambda, dtype=T0_c_w.dtype)), None,
        length=iterations,
    )
    return T


def solve_pnp_ransac(
    pts_w: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
    cam: Camera, key: jax.Array,
    *, threshold_px: float = 2.0, n_hypotheses: int = 256,
    min_inliers: int = 5, refine_iterations: int = 10,
) -> PnPResult:
    """RANSAC PnP over fixed-capacity masked 3D-2D correspondences.

    Mirrors cv::solvePnPRansac at the reference's settings (vo.cpp:318-320)
    with a batched-hypothesis formulation and LM polish on the consensus
    set."""
    uv_n = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
    )
    idx = sample_minimal_sets(key, valid, n_hypotheses, 6)       # [B,6]
    R, t = _dlt_p6(pts_w[idx], uv_n[idx])                        # [B,3,3],[B,3]
    Ts = jax.vmap(lie.rt_to_T)(R, t)                             # [B,4,4]
    err2, z = _reproj_err2_px(Ts, pts_w, uv, cam)                # [B,N]
    th2 = threshold_px * threshold_px
    inl = (err2 < th2) & (z > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    T_best = Ts[best]
    inl_best = inl[best]

    # LM polish on consensus, then re-gate inliers (two rounds)
    for _ in range(2):
        w = inl_best.astype(pts_w.dtype)
        T_best = _gn_refine(T_best, pts_w, uv, w, cam, refine_iterations)
        err2r, zr = _reproj_err2_px(T_best, pts_w, uv, cam)
        inl_best = (err2r < th2) & (zr > 0) & valid

    n = jnp.sum(inl_best)
    return PnPResult(
        T_c_w=T_best, inliers=inl_best, n_inliers=n, ok=n >= min_inliers
    )
