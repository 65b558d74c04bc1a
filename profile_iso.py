import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from monocular_visual_odometry_tpu.utils.config import VOConfig
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.ba import ba_update_state
from monocular_visual_odometry_tpu.models.vo import _step_track_impl, _keyframe_update_impl

cfg = VOConfig()
H, W = 480, 640
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
st = S.init_state(cfg)

def timeit(name, fn, *a, n=20):
    t0 = time.perf_counter(); out = fn(*a); jax.block_until_ready(out)
    print(f"{name:42s} compile {time.perf_counter()-t0:6.1f}s", end="")
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    print(f"  run {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out

ident = jax.jit(lambda s: jax.tree.map(lambda x: x, s))
timeit("identity on VOState", ident, st)

track_only = jax.jit(lambda s, im: _step_track_impl(cfg, cam, s, im, height=H, width=W))
timeit("track impl alone", track_only, st, img)

def track_full(s, im):
    new, out, feats, curr_mp = _step_track_impl(cfg, cam, s, im, height=H, width=W)
    new = jax.lax.cond(out.tracking_ok, lambda x: ba_update_state(cfg, cam, x), lambda x: x, new)
    new = jax.lax.cond(out.is_keyframe,
                       lambda x: _keyframe_update_impl(cfg, cam, x, feats, curr_mp, height=H, width=W),
                       lambda x: x, new)
    return new, out
timeit("track+BAcond+kfcond", jax.jit(track_full), st, img)

def track_ba_only(s, im):
    new, out, feats, curr_mp = _step_track_impl(cfg, cam, s, im, height=H, width=W)
    new = jax.lax.cond(out.tracking_ok, lambda x: ba_update_state(cfg, cam, x), lambda x: x, new)
    return new, out
timeit("track+BAcond", jax.jit(track_ba_only), st, img)
