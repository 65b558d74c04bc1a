"""Multi-stream throughput measurement (VERDICT r4 weak #5 / next #5).

Round-4 established that vmapping the GENERAL fused step does not scale:
``lax.switch``/``lax.cond`` under vmap execute every FSM branch for the
whole batch, so a B-stream step pays init+track+BA+keyframe on every frame
and aggregate fps is flat (THROUGHPUT_r04.json: B=8 -> 1.0x). The round-4
conclusion "single-stream is the chip's best operating point" stopped one
step early: after all streams initialize, a TRACKING-SPECIALIZED batched
step (models.vo.step_tracking_batched — no switch, BA + keyframe update
computed unconditionally and applied by masked select) removes the
branch-duplication cost.

This harness measures BOTH paths:
  general  — vmapped fused scan (the r4 measurement, kept for comparison)
  tracking — 15-frame single-stream warmup per stream (general scan), then
             the steady-state batched scan over the remaining frames

Run on the TPU host: python profile_throughput.py
Writes THROUGHPUT_r05.json.
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
from monocular_visual_odometry_tpu.models.vo import (
    run_sequence, run_sequences_batched)
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

N = int(os.environ.get("THROUGHPUT_FRAMES", "60"))
WARMUP = 15                      # frames of general-FSM scan per stream
BATCHES = [1, 2, 4, 8]
K3 = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)
cfg = VOConfig()
H, W = 480, 640

# B independent sequences: different seeds -> different scenes+trajectories
max_b = max(BATCHES)
CACHE = f"/tmp/mvo_throughput_frames_{N}_{max_b}.npz"
stack_np = None
if os.path.exists(CACHE):
    z = np.load(CACHE)
    # staleness guard: the cache is keyed only by shape, so verify frame 0
    # against a fresh render — any renderer/trajectory code change
    # invalidates it instead of silently corrupting the artifact
    gt_probe = syn.make_trajectory(N, seed=0, translation_step=0.05)
    probe = syn.render_frame(gt_probe[0], syn.default_scene(0),
                             K3).astype(np.float32)
    if np.array_equal(z["frames"][0, 0], probe) and np.array_equal(
            z["gt0"], gt_probe):
        stack_np = z["frames"]
        gts = [z[f"gt{b}"] for b in range(max_b)]
    else:
        print("frame cache stale (renderer changed) — regenerating", flush=True)
if stack_np is None:
    seqs, gts = [], []
    for b in range(max_b):
        gt = syn.make_trajectory(N, seed=b, translation_step=0.05)
        frames = np.stack([syn.render_frame(gt[i], syn.default_scene(b), K3)
                           .astype(np.float32) for i in range(N)])
        seqs.append(frames)
        gts.append(gt)
    stack_np = np.stack(seqs)
    np.savez(CACHE, frames=stack_np, **{f"gt{b}": g for b, g in enumerate(gts)})
stack_all = jnp.asarray(stack_np)                # [B,N,H,W]

out = {"device": str(jax.devices()[0]), "frames_per_seq": N,
       "warmup_frames": WARMUP, "general": {}, "tracking": {}}

# ---- general path (r4 measurement) -----------------------------------------
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

    def sync(o):
        # host device_get of a reduced scalar: block_until_ready proved
        # unreliable for B>=2 programs on the tunnel backend (reported
        # physically impossible fps)
        return float(jnp.sum(o.T_w_c))

    final, outs = run_batch(stack)
    sync(outs)
    t0 = time.perf_counter()
    final, outs = run_batch(stack)
    sync(outs)
    wall = time.perf_counter() - t0
    fps = B * N / wall
    if base_fps is None:
        base_fps = fps
    row = {"batch": B, "agg_fps": round(fps, 1),
           "scaling_vs_b1": round(fps / base_fps, 2)}
    out["general"][f"B={B}"] = row
    print("general", json.dumps(row), flush=True)

# ---- tracking-specialized path ---------------------------------------------
# warm up each stream through init with the general scan (single-stream),
# then batch the steady state
warm_states = []
for b in range(max_b):
    st0 = S.init_state(cfg, seed=b)
    st, outs_w = run_sequence(cfg, cam, st0, stack_all[b, :WARMUP],
                              height=H, width=W)
    warm_states.append(jax.device_get(st))
for b, st in enumerate(warm_states):
    assert int(st.stage) == S.STAGE_TRACKING, f"stream {b} failed to init"

base_fps_t = None
for B in BATCHES:
    sts = jax.tree.map(lambda *xs: jnp.stack(xs), *warm_states[:B])
    frames = stack_all[:B, WARMUP:]
    n_steps = frames.shape[1]

    final, outs = run_sequences_batched(cfg, cam, sts, frames,
                                        height=H, width=W)
    float(jnp.sum(outs.T_w_c))
    t0 = time.perf_counter()
    final, outs = run_sequences_batched(cfg, cam, sts, frames,
                                        height=H, width=W)
    float(jnp.sum(outs.T_w_c))
    wall = time.perf_counter() - t0
    fps = B * n_steps / wall
    if base_fps_t is None:
        base_fps_t = fps
    # accuracy guard: the batched steady state must still track correctly
    ates = []
    for b in range(B):
        est = np.asarray(outs.T_w_c)[:, b]        # [n_steps,4,4] (scan-major)
        gt = gts[b][WARMUP:]
        # normalize by the EVALUATED tail's path length, same convention
        # as every other artifact's ATE% (review r5: dividing by the full
        # trajectory length deflated this guard ~25%)
        ates.append(metrics.ate_rmse(est, gt, "sim3")
                    / metrics.trajectory_length(gt) * 100)
    row = {"batch": B, "agg_fps": round(fps, 1),
           "ms_per_frame_per_stream": round(wall / n_steps * 1e3, 3),
           "scaling_vs_b1": round(fps / base_fps_t, 2),
           "ate_pct_max": round(float(np.max(ates)), 2),
           "tracked_all": bool(np.all(np.asarray(final.stage)
                                      == S.STAGE_TRACKING))}
    out["tracking"][f"B={B}"] = row
    print("tracking", json.dumps(row), flush=True)

with open("THROUGHPUT_r05.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote THROUGHPUT_r05.json")
