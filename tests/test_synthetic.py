"""Tests for the synthetic benchmark generator."""

import numpy as np
import pytest

from monocular_visual_odometry_tpu.data import synthetic as syn


def test_two_view_scene_consistency():
    sc = syn.synthesize_two_view(n=100, seed=3)
    # reproject world points through both poses -> must hit given pixels
    uv1, z1 = syn._project(sc.pts_w, sc.T_w_c1, sc.K)
    uv2, z2 = syn._project(sc.pts_w, sc.T_w_c2, sc.K)
    np.testing.assert_allclose(uv1, sc.uv1, atol=1e-9)
    np.testing.assert_allclose(uv2, sc.uv2, atol=1e-9)
    assert (z1 > 0).all() and (z2 > 0).all()
    # epipolar constraint: x2^T E x1 == 0 with E = [t]x R of T_c2_c1
    T_21 = np.linalg.inv(sc.T_c1_c2)
    R, t = T_21[:3, :3], T_21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    Kinv = np.linalg.inv(sc.K)
    x1 = np.concatenate([sc.uv1, np.ones((100, 1))], axis=1) @ Kinv.T
    x2 = np.concatenate([sc.uv2, np.ones((100, 1))], axis=1) @ Kinv.T
    resid = np.abs(np.sum(x2 * (x1 @ E.T), axis=1))
    assert resid.max() < 1e-9


def test_planar_scene_has_homography():
    sc = syn.synthesize_two_view(n=60, seed=1, planar=True)
    # a homography must map uv1 -> uv2 exactly: fit by DLT, check residual
    n = len(sc.uv1)
    A = []
    for (u1, v1), (u2, v2) in zip(sc.uv1, sc.uv2):
        A.append([-u1, -v1, -1, 0, 0, 0, u2 * u1, u2 * v1, u2])
        A.append([0, 0, 0, -u1, -v1, -1, v2 * u1, v2 * v1, v2])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    p = np.concatenate([sc.uv1, np.ones((n, 1))], 1) @ H.T
    proj = p[:, :2] / p[:, 2:3]
    assert np.abs(proj - sc.uv2).max() < 1e-6


def test_pnp_scene_consistency():
    sc = syn.synthesize_pnp_scene(n=50, seed=2)
    uv, z = syn._project(sc.pts_w, sc.T_w_c, sc.K)
    np.testing.assert_allclose(uv, sc.uv, atol=1e-9)
    assert (z > 0).all()


def test_render_frame_has_texture():
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    img = syn.render_frame(np.eye(4), planes, K, height=120, width=160)
    assert img.shape == (120, 160)
    assert img.std() > 20  # strong contrast for corner detection
    # every pixel hits some plane (closed room)
    assert (img > 0).mean() > 0.95


def test_render_sequence_layout(tmp_path):
    poses = syn.render_sequence(str(tmp_path), n_frames=3, height=60, width=80)
    assert (tmp_path / "rgb_00000.png").exists()
    assert (tmp_path / "rgb_00002.png").exists()
    from monocular_visual_odometry_tpu.utils import io as vio

    gt = vio.read_trajectory(tmp_path / "cam_traj_truth.txt")
    np.testing.assert_allclose(gt, poses, atol=1e-5)


def test_photoconsistency_between_frames():
    """A world point visible in two rendered frames must have (nearly) the
    same intensity — validates the renderer's geometry end-to-end."""
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    poses = syn.make_trajectory(10, seed=0)
    img0 = syn.render_frame(poses[0], planes, K)
    img5 = syn.render_frame(poses[5], planes, K)
    # pick points on the far wall (z=8 plane) via backprojection from frame 0
    rng = np.random.default_rng(0)
    uv0 = rng.uniform([200, 150], [440, 330], size=(200, 2))
    Kinv = np.linalg.inv(K)
    rays = np.concatenate([uv0, np.ones((200, 1))], 1) @ Kinv.T
    R0, t0 = poses[0][:3, :3], poses[0][:3, 3]
    dirs = rays @ R0.T
    tt = (8.0 - t0[2]) / dirs[:, 2]
    X = t0 + dirs * tt[:, None]
    uv5, z5 = syn._project(X, poses[5], K)
    ok = (uv5[:, 0] > 2) & (uv5[:, 0] < 637) & (uv5[:, 1] > 2) & (uv5[:, 1] < 477)
    a = img0[uv0[ok][:, 1].astype(int), uv0[ok][:, 0].astype(int)].astype(float)
    b = img5[uv5[ok][:, 1].astype(int), uv5[ok][:, 0].astype(int)].astype(float)
    # most sampled points should photo-match within interpolation error
    frac_close = (np.abs(a - b) < 40).mean()
    assert frac_close > 0.8, frac_close


def test_jpeg_perturbation_shape_and_effect():
    """JPEG-artifact perturbation (round 5): blockwise DCT quantization
    must change the image (blocking/ringing), stay in range, and converge
    to the original as severity -> 0."""
    planes = syn.default_scene(0)
    K = np.array([[307.0, 0, 160], [0, 307.0, 120], [0, 0, 1.0]])
    img = syn.render_frame(np.eye(4), planes, K, height=240, width=320)
    frames = img[None].astype(np.float32)
    j2 = syn.perturb_frames(frames, "jpeg", 2.0)
    assert j2.shape == frames.shape
    assert j2.min() >= 0.0 and j2.max() <= 255.0
    assert np.abs(j2 - frames).mean() > 1.0          # artifacts present
    j_tiny = syn.perturb_frames(frames, "jpeg", 0.01)
    assert np.abs(j_tiny - frames).mean() < np.abs(j2 - frames).mean()


def test_vignette_perturbation():
    """Vignetting (round 5): multiplicative radial falloff — center nearly
    untouched, corners darkened by the cos^4^severity law."""
    planes = syn.default_scene(0)
    K = np.array([[307.0, 0, 160], [0, 307.0, 120], [0, 0, 1.0]])
    img = syn.render_frame(np.eye(4), planes, K, height=240, width=320)
    frames = img[None].astype(np.float32)
    v = syn.perturb_frames(frames, "vignette", 2.0)[0]
    c = (slice(110, 130), slice(150, 170))
    corner = (slice(0, 20), slice(0, 20))
    center_ratio = v[c].mean() / max(frames[0][c].mean(), 1e-6)
    corner_ratio = v[corner].mean() / max(frames[0][corner].mean(), 1e-6)
    assert center_ratio > 0.95, center_ratio
    assert corner_ratio < 0.55, corner_ratio
