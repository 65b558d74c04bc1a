import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera, cam2pixel, in_frame
from monocular_visual_odometry_tpu.ops import matching, pnp, lie
from monocular_visual_odometry_tpu.ops.features import features_from_config
from monocular_visual_odometry_tpu.models import state as S

cfg = VOConfig()
H, W = 480, 640
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
st = S.init_state(cfg)

def timeit(name, fn, *a, n=20):
    t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
    c = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:44s} compile {c:6.1f}s  run {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out

def prefix_a(s, im):  # features only
    feats = features_from_config(im, cfg.orb)
    return feats

def prefix_b(s, im):  # + frustum scan
    feats = features_from_config(im, cfg.orb)
    T_c_w_prev = lie.inv_T(s.T_w_c)
    p_cam = lie.transform_points(T_c_w_prev, s.map.pts)
    proj = cam2pixel(p_cam, cam)
    candidates = s.map.valid & (p_cam[:, 2] > 0) & in_frame(proj, H, W)
    return feats, proj, candidates

def prefix_c(s, im):  # + matching
    feats, proj, candidates = prefix_b(s, im)
    m = matching.match_features(
        s.map.desc, feats.desc, candidates, feats.valid, proj, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_pnp,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio)
    return feats, m

def prefix_d(s, im):  # + pnp
    feats, m = prefix_c(s, im)
    uv = feats.kpts[m.train_idx]
    key = jax.random.PRNGKey(0)
    res = pnp.solve_pnp_ransac(
        s.map.pts, uv, m.valid, cam, key,
        threshold_px=cfg.ransac.pnp_reproj_threshold_px,
        n_hypotheses=cfg.ransac.pnp_n_hypotheses,
        min_inliers=cfg.ransac.pnp_min_inliers)
    return feats, m, res

timeit("a: features", jax.jit(prefix_a), st, img)
timeit("b: +frustum", jax.jit(prefix_b), st, img)
timeit("c: +matching", jax.jit(prefix_c), st, img)
timeit("d: +pnp", jax.jit(prefix_d), st, img)
