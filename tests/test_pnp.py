"""RANSAC-PnP tests against exact synthetic scenes and the OpenCV oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import pnp
from monocular_visual_odometry_tpu.ops.camera import Camera


def _cam(K):
    return Camera.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2])


def _pose_err(T_c_w_est, T_w_c_gt):
    T_est = np.linalg.inv(np.asarray(T_c_w_est))
    dT = np.linalg.inv(T_w_c_gt) @ T_est
    rot = np.degrees(np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1)))
    trans = np.linalg.norm(dT[:3, 3])
    return rot, trans


def _solve(sc, seed=0, **kw):
    cam = _cam(sc.K)
    return pnp.solve_pnp_ransac(
        jnp.asarray(sc.pts_w, dtype=jnp.float32),
        jnp.asarray(sc.uv, dtype=jnp.float32),
        jnp.ones(len(sc.uv), bool), cam, jax.random.PRNGKey(seed), **kw
    )


def test_clean():
    sc = syn.synthesize_pnp_scene(n=100, seed=0)
    res = _solve(sc)
    rot, trans = _pose_err(res.T_c_w, sc.T_w_c)
    assert bool(res.ok)
    assert int(res.n_inliers) > 95
    assert rot < 0.1, rot
    assert trans < 0.01, trans


def test_noise():
    sc = syn.synthesize_pnp_scene(n=150, seed=1, noise_px=0.5)
    res = _solve(sc, seed=1)
    rot, trans = _pose_err(res.T_c_w, sc.T_w_c)
    assert int(res.n_inliers) > 120
    assert rot < 0.5, rot
    assert trans < 0.05, trans


def test_outliers():
    sc = syn.synthesize_pnp_scene(n=200, seed=2, noise_px=0.5, outlier_frac=0.4)
    res = _solve(sc, seed=2)
    rot, trans = _pose_err(res.T_c_w, sc.T_w_c)
    assert rot < 0.7, rot
    assert trans < 0.07, trans
    # outlier slots must be excluded
    assert int(res.n_inliers) <= 200 * 0.65


def test_masked_slots():
    sc = syn.synthesize_pnp_scene(n=80, seed=3)
    N = 128
    pts = np.zeros((N, 3), np.float32)
    uv = np.zeros((N, 2), np.float32)
    pts[:80] = sc.pts_w
    uv[:80] = sc.uv
    valid = np.array([True] * 80 + [False] * 48)
    res = pnp.solve_pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(valid),
        _cam(sc.K), jax.random.PRNGKey(0))
    assert not np.asarray(res.inliers)[80:].any()
    rot, trans = _pose_err(res.T_c_w, sc.T_w_c)
    assert rot < 0.2 and trans < 0.02


def test_too_few_points_flags_not_ok():
    sc = syn.synthesize_pnp_scene(n=16, seed=4)
    valid = np.zeros(16, bool)
    valid[:3] = True  # fewer than a minimal set
    res = pnp.solve_pnp_ransac(
        jnp.asarray(sc.pts_w, dtype=jnp.float32),
        jnp.asarray(sc.uv, dtype=jnp.float32),
        jnp.asarray(valid), _cam(sc.K), jax.random.PRNGKey(0))
    assert not bool(res.ok)


def test_against_opencv():
    cv2 = pytest.importorskip("cv2")
    sc = syn.synthesize_pnp_scene(n=120, seed=5, noise_px=0.5, outlier_frac=0.2)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        sc.pts_w.astype(np.float64), sc.uv.astype(np.float64), sc.K, None,
        iterationsCount=100, reprojectionError=2.0, confidence=0.999)
    assert ok
    R_cv, _ = cv2.Rodrigues(rvec)
    res = _solve(sc, seed=5)
    dR = np.asarray(res.T_c_w)[:3, :3] @ R_cv.T
    rot_gap = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_gap = np.linalg.norm(np.asarray(res.T_c_w)[:3, 3] - tvec.ravel())
    assert rot_gap < 0.5, rot_gap
    assert t_gap < 0.05, t_gap
