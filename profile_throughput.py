"""Throughput-mode hypothesis test (VERDICT r3 next #6): IF the per-frame
time were dominated by per-op fixed overhead, vmapping the entire fused VO
pipeline over B independent sequences would amortize it and aggregate
frames/s would scale with B.

MEASURED ANSWER (THROUGHPUT_r04.json, docs/LATENCY.md): it does not.
vmap makes lax.cond/lax.switch execute every FSM branch for the whole
batch (the vmapped stream pays init+track+BA+keyframe on every frame), and
per-op wall time scales ~linearly with batch (8x data -> 8.04x time), so
aggregate fps is flat. The kernels run at consistent per-element
throughput — not on launch overhead — and the plain single-stream
lax.scan is the chip's best operating point. Kept as the measurement that
established this; scale-out is per-chip streams / mesh-parallel BA.

Run on the TPU host: python profile_throughput.py
Writes THROUGHPUT_r04.json.
"""
import json
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
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

N = int(os.environ.get("THROUGHPUT_FRAMES", "60"))
BATCHES = [1, 2, 4, 8]
K3 = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)
cfg = VOConfig()
H, W = 480, 640

# B independent sequences: different seeds -> different scenes+trajectories
max_b = max(BATCHES)
seqs, gts = [], []
for b in range(max_b):
    gt = syn.make_trajectory(N, seed=b, translation_step=0.05)
    frames = np.stack([syn.render_frame(gt[i], syn.default_scene(b), K3)
                       .astype(np.float32) for i in range(N)])
    seqs.append(frames)
    gts.append(gt)
stack_all = jnp.asarray(np.stack(seqs))          # [B,N,H,W]

out = {"device": str(jax.devices()[0]), "frames_per_seq": N, "rows": {}}
base_fps = None
for B in BATCHES:
    stack = stack_all[:B]

    @jax.jit
    def run_batch(frames):
        st0 = jax.vmap(lambda i: S.init_state(cfg, seed=i))(
            jnp.arange(frames.shape[0]))
        return jax.vmap(
            lambda s, f: run_sequence(cfg, cam, s, f, height=H, width=W)
        )(st0, frames)

    final, outs = run_batch(stack)                 # compile + warm
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    final, outs = run_batch(stack)
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    fps = B * N / wall
    if base_fps is None:
        base_fps = fps
    ates = []
    for b in range(B):
        est = np.asarray(outs.T_w_c[b])
        gt = gts[b]
        ates.append(metrics.ate_rmse(est, gt, "sim3")
                    / metrics.trajectory_length(gt) * 100)
    row = {"batch": B, "agg_fps": round(fps, 1),
           "ms_per_frame_per_stream": round(wall / N * 1e3, 3),
           "scaling_vs_b1": round(fps / base_fps, 2),
           "ate_pct_max": round(float(np.max(ates)), 2),
           "tracked_all": bool(np.all(
               np.asarray(final.stage) == S.STAGE_TRACKING))}
    out["rows"][f"B={B}"] = row
    print(json.dumps(row), flush=True)

with open("THROUGHPUT_r04.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote THROUGHPUT_r04.json")
