"""Piecewise timing of the bench's config-1 init_pair on the REAL bench
images (the twoview-only profile uses synthetic correspondences and shows
~20ms while the full init_pair measures ~39ms — find the difference).
Run: python profile_init.py"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.models.vo import VOEngine
from monocular_visual_odometry_tpu.ops import matching, twoview
from monocular_visual_odometry_tpu.ops.features import features_from_config
from monocular_visual_odometry_tpu.utils import io as vio
from monocular_visual_odometry_tpu.data import synthetic as syn

cfg = VOConfig()
seq_dir = os.environ.get("MVO_BENCH_DIR", "/tmp/mvo_bench_seq150")
if not os.path.exists(os.path.join(seq_dir, "rgb_00003.png")):
    syn.render_sequence(seq_dir, n_frames=10, seed=0)
from monocular_visual_odometry_tpu.runtime import FrameLoader
with FrameLoader(vio.image_paths(seq_dir, 4), 480, 640) as loader:
    frames = np.stack([f.copy() for f in loader])
img1 = jnp.asarray(frames[0], jnp.float32)
img2 = jnp.asarray(frames[3], jnp.float32)
cam = VOEngine(cfg, 480, 640).cam
key = jax.random.PRNGKey(0)

def timeit(name, fn, *a, n=10):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out

# stage A: features x2
fA = jax.jit(lambda i1, i2: (features_from_config(i1, cfg.orb),
                             features_from_config(i2, cfg.orb)))
f1, f2 = timeit("A features x2", fA, img1, img2)

# stage B: + match
def _b(i1, i2):
    f1 = features_from_config(i1, cfg.orb)
    f2 = features_from_config(i2, cfg.orb)
    m = matching.match_features(
        f1.desc, f2.desc, f1.valid, f2.valid, f1.kpts, f2.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_init)
    return f1, f2, m
fB = jax.jit(_b)
f1, f2, m = timeit("B +match", fB, img1, img2)

# stage C: full init_pair
def _c(i1, i2, key):
    f1, f2, m = _b(i1, i2)
    tv = twoview.estimate_relative_pose(
        f1.kpts[m.query_idx], f2.kpts[m.train_idx], m.valid, cam, key,
        threshold_px=cfg.ransac.threshold_px,
        n_hypotheses=cfg.ransac.n_hypotheses)
    return tv.R, tv.t, tv.inliers
fC = jax.jit(_c)
timeit("C full init_pair", fC, img1, img2, key)

# stage D: twoview alone on the REAL matched points
uv1 = np.asarray(f1.kpts[m.query_idx]); uv2 = np.asarray(f2.kpts[m.train_idx])
valid = np.asarray(m.valid)
print("n matches:", valid.sum())
fD = jax.jit(functools.partial(twoview.estimate_relative_pose,
                               threshold_px=cfg.ransac.threshold_px,
                               n_hypotheses=cfg.ransac.n_hypotheses))
timeit("D twoview alone (real pts)", fD, jnp.asarray(uv1), jnp.asarray(uv2),
       jnp.asarray(valid), cam, key)
print("nh =", cfg.ransac.n_hypotheses)
