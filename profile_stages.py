"""Stage-level TPU timing for the fused VO step. Not part of the package;
a working tool for perf rounds. Run: python profile_stages.py"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.ops import matching, twoview, pnp, lie
from monocular_visual_odometry_tpu.ops.features import features_from_config
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.ba import ba_update_state
from monocular_visual_odometry_tpu.models.vo import step_fused, _keyframe_update_impl
import functools

cfg = VOConfig()
H, W = 480, 640
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

def timeit(name, fn, *a, n=20, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return out

feat_fn = jax.jit(lambda im: features_from_config(im, cfg.orb))
feats = timeit("features (ORB frontend)", feat_fn, img)

K = cfg.orb.max_keypoints
match_fn = jax.jit(functools.partial(
    matching.match_features, method=cfg.match.method_index,
    max_pixel_dist=cfg.match.max_pixel_dist_init,
    xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
    lowe_ratio=cfg.match.lowe_dist_ratio))
m = timeit("matching (init radius)", match_fn, feats.desc, feats.desc,
           feats.valid, feats.valid, feats.kpts, feats.kpts)

key = jax.random.PRNGKey(0)
uv1 = feats.kpts[m.query_idx]; uv2 = feats.kpts[m.train_idx]
tv_fn = jax.jit(functools.partial(twoview.estimate_relative_pose,
                                  threshold_px=cfg.ransac.threshold_px,
                                  n_hypotheses=cfg.ransac.n_hypotheses))
timeit("twoview E/H estimate (init)", tv_fn, uv1, uv2, m.valid, cam, key)

# PnP with realistic sizes
M = cfg.map.max_map_points
pts3d = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
uv = jnp.asarray(rng.uniform(0, 640, (M, 2)).astype(np.float32))
msk = jnp.asarray(rng.uniform(size=M) < 0.1)
pnp_fn = jax.jit(functools.partial(pnp.solve_pnp_ransac,
                                   threshold_px=cfg.ransac.pnp_reproj_threshold_px,
                                   n_hypotheses=cfg.ransac.pnp_n_hypotheses,
                                   min_inliers=cfg.ransac.pnp_min_inliers))
timeit("PnP RANSAC", pnp_fn, pts3d, uv, msk, cam, key)

# BA on a plausible state
st = S.init_state(cfg)
st2, _ = step_fused(cfg, cam, st, img, height=H, width=W)
ba_fn = jax.jit(functools.partial(ba_update_state, cfg), static_argnums=())
try:
    ba_jit = jax.jit(lambda s: ba_update_state(cfg, cam, s))
    timeit("BA update (window LM)", ba_jit, st2)
except Exception as e:
    print("BA:", e)

# keyframe update
kf_jit = jax.jit(lambda s, f, c: _keyframe_update_impl(cfg, cam, s, f, c, height=H, width=W))
curr_mp = jnp.full(K, -1, jnp.int32)
timeit("keyframe update", kf_jit, st2, feats, curr_mp)

# full fused step at each stage value
for stage in (0, 1, 2):
    st_s = st2._replace(stage=jnp.asarray(stage, jnp.int32))
    timeit(f"step_fused stage={stage}", lambda s: step_fused(cfg, cam, s, img, height=H, width=W), st_s)
print("device:", jax.devices()[0])

# --- overhead isolation ---
ident = jax.jit(lambda s: jax.tree.map(lambda x: x + 0 if x.dtype != jnp.bool_ else x, s))
timeit("identity on VOState", ident, st2)

from monocular_visual_odometry_tpu.models.vo import _step_track_impl
track_only = jax.jit(lambda s, im: _step_track_impl(cfg, cam, s, im, height=H, width=W))
timeit("track impl (no BA/kf, no switch)", track_only, st2, img)

def track_full(s, im):
    new, out, feats, curr_mp = _step_track_impl(cfg, cam, s, im, height=H, width=W)
    new = jax.lax.cond(out.tracking_ok, lambda x: ba_update_state(cfg, cam, x), lambda x: x, new)
    new = jax.lax.cond(out.is_keyframe,
                       lambda x: _keyframe_update_impl(cfg, cam, x, feats, curr_mp, height=H, width=W),
                       lambda x: x, new)
    return new, out
timeit("track + BA cond + kf cond (no switch)", jax.jit(track_full), st2, img)
