"""Piecewise TPU timing of the two-view init path (BENCH config 1).
Working perf tool, not part of the package. Run: python profile_twoview.py"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera, pixel2cam_norm_plane
from monocular_visual_odometry_tpu.ops import epipolar as epi
from monocular_visual_odometry_tpu.ops import lie, scoring, twoview

cfg = VOConfig()
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
rng = np.random.default_rng(0)
N = cfg.orb.max_keypoints
# synthetic correspondences with ~70% inliers
pts = rng.normal(size=(N, 3)) * [1, 1, 0.3] + [0, 0, 4]
R_gt = np.eye(3); t_gt = np.array([0.3, 0.05, 0.02])
p1 = pts; p2 = pts @ R_gt.T + t_gt
uv1 = np.stack([p1[:, 0] / p1[:, 2] * cam.fx + cam.cx,
                p1[:, 1] / p1[:, 2] * cam.fy + cam.cy], -1)
uv2 = np.stack([p2[:, 0] / p2[:, 2] * cam.fx + cam.cx,
                p2[:, 1] / p2[:, 2] * cam.fy + cam.cy], -1)
out = rng.uniform(size=N) > 0.7
uv2[out] += rng.uniform(-80, 80, size=(out.sum(), 2))
uv1 = jnp.asarray(uv1, jnp.float32); uv2 = jnp.asarray(uv2, jnp.float32)
valid = jnp.ones(N, bool)
key = jax.random.PRNGKey(0)

x1 = pixel2cam_norm_plane(uv1, cam)
x2 = pixel2cam_norm_plane(uv2, cam)
K = cam.K
focal = (cam.fx + cam.fy) * 0.5
th_n = cfg.ransac.threshold_px / focal
NH = cfg.ransac.n_hypotheses

def timeit(name, fn, *a, n=20):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out

print(f"N={N} hypotheses={NH}")
f_e = jax.jit(functools.partial(epi.estimate_essential, threshold=th_n,
                                n_hypotheses=NH, minimal="8pt"))
e_model = timeit("estimate_essential (RANSAC)", f_e, x1, x2, valid, key)

f_rp = jax.jit(epi.recover_pose_from_E)
timeit("recover_pose_from_E", f_rp, e_model.model, x1, x2, e_model.inliers)

f_h = jax.jit(functools.partial(epi.estimate_homography,
                                threshold_px=cfg.ransac.h_threshold_px
                                if hasattr(cfg.ransac, "h_threshold_px") else 3.0,
                                n_hypotheses=NH))
h_model = timeit("estimate_homography (RANSAC)", f_h, uv1, uv2, valid, key)

f_dh = jax.jit(functools.partial(epi.decompose_homography))
timeit("decompose_homography", f_dh, h_model.model, K)

Kinv = jnp.linalg.inv(K)
F = Kinv.T @ e_model.model @ Kinv
f_se = jax.jit(functools.partial(scoring.essential_score, sigma=1.0))
timeit("essential_score", f_se, F, uv1, uv2, e_model.inliers)
f_sh = jax.jit(functools.partial(scoring.homography_score, sigma=1.0))
timeit("homography_score", f_sh, h_model.model, uv1, uv2, h_model.inliers)

R_e, t_e, _ = f_rp(e_model.model, x1, x2, e_model.inliers)
huber = 2.0 * th_n
for iters in (12,):
    f_ref = jax.jit(lambda R0, t0, it=iters: jax.vmap(
        lambda R, t: epi.refine_pose_sampson(R, t, x1, x2, valid,
                                             iterations=it, huber_delta=huber)
    )(R0, t0))
    Rs = jnp.broadcast_to(R_e[None], (5, 3, 3))
    ts = jnp.broadcast_to(t_e[None], (5, 3))
    timeit(f"refine_pose_sampson x5 (iters={iters})", f_ref, Rs, ts)

f_tri = jax.jit(epi.triangulate)
T21 = lie.rt_to_T(R_e, t_e)
timeit("triangulate", f_tri, x1, x2, T21)

# full path at various hypothesis counts
for nh in (512, 128):
    f_full = jax.jit(functools.partial(
        twoview.estimate_relative_pose, threshold_px=cfg.ransac.threshold_px,
        n_hypotheses=nh))
    timeit(f"estimate_relative_pose (nh={nh})", f_full, uv1, uv2, valid, cam, key)
