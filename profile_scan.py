"""On-device per-stage costs: each piece wrapped in a lax.scan of N
iterations inside ONE dispatch — removes the per-call tunnel latency that
contaminates profile_stages.py on remote-attached TPUs.
Run: python profile_scan.py"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera, cam2pixel, in_frame
from monocular_visual_odometry_tpu.ops import matching, pnp, lie
from monocular_visual_odometry_tpu.ops.features import features_from_config
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.ba import ba_update_state
from monocular_visual_odometry_tpu.models.vo import (
    step_fused, _step_track_impl, _keyframe_update_impl)

cfg = VOConfig()
H, W = 480, 640
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
N_ITER = 20


import sys as _sys
_SEL = set(_sys.argv[1:])
def scan_time(name, body, init):
    """body: carry -> carry. One dispatch, N_ITER reps inside scan."""
    if _SEL and not any(s in name for s in _SEL):
        return None
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda s, _: (body(s), 0), c, None, length=N_ITER)[0]
    out = run(init); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    print(f"{name:44s} {dt:8.3f} ms/iter")
    return out


# build a plausible tracking state by running two frames
st = S.init_state(cfg)
st, _ = step_fused(cfg, cam, st, img, height=H, width=W)

# 1. features only (carry a checksum so nothing is DCE'd)
def body_feat(c):
    f = features_from_config(img + c['x'], cfg.orb)
    return {'x': jnp.sum(f.kpts) * 1e-12}
scan_time("features", body_feat, {'x': jnp.asarray(0.0)})

# 2. frustum + matching
def body_match(c):
    s = c
    T_c_w_prev = lie.inv_T(s.T_w_c)
    p_cam = lie.transform_points(T_c_w_prev, s.map.pts)
    proj = cam2pixel(p_cam, cam)
    candidates = s.map.valid & (p_cam[:, 2] > 0) & in_frame(proj, H, W)
    feats = features_from_config(img, cfg.orb)
    m = matching.match_features(
        s.map.desc, feats.desc, candidates, feats.valid, proj, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_pnp,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio)
    return s._replace(T_w_c=s.T_w_c + jnp.sum(m.valid) * 1e-12)
scan_time("features+frustum+match", body_match, st)

# 3. + pnp
def body_pnp(c):
    s = c
    T_c_w_prev = lie.inv_T(s.T_w_c)
    p_cam = lie.transform_points(T_c_w_prev, s.map.pts)
    proj = cam2pixel(p_cam, cam)
    candidates = s.map.valid & (p_cam[:, 2] > 0) & in_frame(proj, H, W)
    feats = features_from_config(img, cfg.orb)
    m = matching.match_features(
        s.map.desc, feats.desc, candidates, feats.valid, proj, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_pnp,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio)
    uv = feats.kpts[m.train_idx]
    res = pnp.solve_pnp_ransac(
        s.map.pts, uv, m.valid, cam, jax.random.PRNGKey(0),
        threshold_px=cfg.ransac.pnp_reproj_threshold_px,
        n_hypotheses=cfg.ransac.pnp_n_hypotheses,
        min_inliers=cfg.ransac.pnp_min_inliers)
    return s._replace(T_w_c=s.T_w_c + jnp.sum(res.T_c_w) * 1e-12)
scan_time("features+frustum+match+pnp", body_pnp, st)

# 4. full track impl
def body_track(c):
    new, out, feats, curr_mp = _step_track_impl(cfg, cam, c, img, height=H, width=W)
    return new._replace(frame_idx=c.frame_idx)  # keep ring slot stable
scan_time("track impl (full)", body_track, st)

# 5. BA update alone
def body_ba(c):
    return ba_update_state(cfg, cam, c)
scan_time("ba_update_state", body_ba, st)

# 6. keyframe update alone
feats0 = features_from_config(img, cfg.orb)
curr0 = jnp.full(cfg.orb.max_keypoints, -1, jnp.int32)
def body_kf(c):
    return _keyframe_update_impl(cfg, cam, c, feats0, curr0, height=H, width=W)._replace(
        frame_idx=c.frame_idx, erase_ratio=c.erase_ratio)
scan_time("keyframe_update", body_kf, st)

# 7. fused step (stage as-is = tracking path, no kf taken typically)
def body_step(c):
    new, out = step_fused(cfg, cam, c, img, height=H, width=W)
    return new._replace(frame_idx=c.frame_idx, stage=c.stage)
scan_time("step_fused (track, conds as they fall)", body_step, st)
print("device:", jax.devices()[0])
