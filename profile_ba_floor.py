"""Decompose the BA step's latency (VERDICT r3 weak #2 / next #6): the
measured ~2.85 ms for ~2.6 MFLOP means something other than math dominates.
This tool separates the three candidates on the real chip:

  1. fixed overhead  — gather_window + write_back + dispatch glue
  2. per-iteration   — marginal cost of one LM iteration (sweep iterations)
  3. pass structure  — each iteration runs TWO full residual passes
                       (J-pass + accept/reject cost pass)

Timing is pipelined (n back-to-back async dispatches, one sync) so the
~20 ms tunnel round-trip does not sit in the numbers.

Run on the TPU host: python profile_ba_floor.py
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MVO_JAX_CACHE", "/tmp/mvo_jax_cache"))
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.models import ba as BA
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils.config import VOConfig

cfg = VOConfig()
cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy, cfg.dataset.cx, cfg.dataset.cy)
H, W = 480, 640

# a REAL tracking-mode state (post-init, live map) — synthetic random
# states would give the matcher/BA unrealistic sparsity
K3 = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
gt = syn.make_trajectory(16, seed=0, translation_step=0.05)
frames = np.stack([syn.render_frame(gt[i], syn.default_scene(0), K3)
                   .astype(np.float32) for i in range(16)])
st0 = S.init_state(cfg)
st, _ = run_sequence(cfg, cam, st0, jnp.asarray(frames), height=H, width=W)
jax.block_until_ready(st)
print("state ready: stage", int(st.stage), "map pts", int(st.map.n_valid))


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:8.3f} ms")
    return best


# --- full BA step at swept iteration counts --------------------------------
walls = {}
for it in (1, 2, 4, 8, 12):
    c = cfg.replace(ba=dataclasses.replace(cfg.ba, iterations=it))
    fn = jax.jit(lambda s, c=c: BA.ba_update_state(c, cam, s))
    walls[it] = timeit(f"ba_update_state iterations={it}", fn, st)

its = sorted(walls)
xs = np.array(its, float)
ys = np.array([walls[i] for i in its])
slope, intercept = np.polyfit(xs, ys, 1)
print(f"\nper-iteration marginal cost : {slope * 1e3:7.3f} ms")
print(f"fixed overhead (intercept)  : {intercept * 1e3:7.3f} ms")

# --- components of the fixed part ------------------------------------------
gather = jax.jit(lambda s: BA.gather_window(cfg, s))
prob, slots = gather(st)
jax.block_until_ready(prob)
timeit("gather_window", gather, st)

solve = jax.jit(lambda p: BA.ba_solve(cfg, cam, p))
timeit("ba_solve (12 it, solve only)", solve, prob)

T_c_w, pts, _ = solve(prob)
wb = jax.jit(lambda s, p, T, x: BA.write_back(cfg, s, p, slots, T, x))
timeit("write_back", wb, st, prob, T_c_w, pts)

print("\ndevice:", jax.devices()[0])
