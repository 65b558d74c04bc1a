"""Benchmark: full VO pipeline (init + tracking + local map + windowed BA)
on the synthetic benchmark sequence, on whatever device JAX provides (the
driver runs this on a real TPU chip).

Prints ONE JSON line:
  {"metric": "vo_fps", "value": <steady-state frames/s>, "unit": "frames/s",
   "vs_baseline": <value / 15.0>, ...extras}

Baseline note: the reference publishes no throughput at all (BASELINE.md) —
its interactive loop blocks on cv::waitKey + PCL spin every frame
(run_vo.cpp:220,310). 15 fps is the documented assumption for a
C++/OpenCV ORB pipeline of its shape on desktop CPU; the north-star target
is >10x that (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_FPS_ASSUMPTION = 15.0


def main() -> int:
    n_frames = int(os.environ.get("MVO_BENCH_FRAMES", "40"))
    from monocular_visual_odometry_tpu.data import synthetic as syn
    from monocular_visual_odometry_tpu.models import state as S
    from monocular_visual_odometry_tpu.models.vo import VOEngine
    from monocular_visual_odometry_tpu.utils import io as vio, metrics
    from monocular_visual_odometry_tpu.utils.config import VOConfig

    seq_dir = os.environ.get("MVO_BENCH_DIR", "/tmp/mvo_bench_seq")
    gt_file = os.path.join(seq_dir, "cam_traj_truth.txt")
    if not os.path.exists(os.path.join(seq_dir, f"rgb_{n_frames-1:05d}.png")):
        syn.render_sequence(seq_dir, n_frames=n_frames, seed=0)
    gt = vio.read_trajectory(gt_file)[:n_frames]

    from monocular_visual_odometry_tpu.runtime import FrameLoader

    with FrameLoader(vio.image_paths(seq_dir, n_frames), 480, 640) as loader:
        frames = [f.copy() for f in loader]

    import jax
    import jax.numpy as jnp

    cfg = VOConfig()
    H, W = frames[0].shape
    engine = VOEngine(cfg, H, W)

    # pass 1 (sync, includes compiles): correctness + per-frame latency
    est = []
    per_frame = []
    for img in frames:
        t0 = time.perf_counter()
        out = engine.add_frame(img)
        per_frame.append(time.perf_counter() - t0)
        est.append(np.asarray(out.T_w_c))
    est = np.stack(est)
    med_latency = float(np.median(per_frame[12:]))
    ate = metrics.ate_rmse(est, gt, "sim3")

    # pass 2 (whole sequence in ONE device dispatch via lax.scan): true
    # on-device throughput, no per-frame dispatch latency.
    from monocular_visual_odometry_tpu.models.vo import run_sequence

    stack = jnp.asarray(np.stack(frames))
    state0 = S.init_state(cfg)
    final, outs = run_sequence(cfg, engine.cam, state0, stack, height=H, width=W)
    jax.block_until_ready(outs)           # compile + warm
    state0 = S.init_state(cfg)
    t0 = time.perf_counter()
    final, outs = run_sequence(cfg, engine.cam, state0, stack, height=H, width=W)
    jax.block_until_ready(outs)
    wall2 = time.perf_counter() - t0
    fps = n_frames / wall2
    est2 = np.asarray(outs.T_w_c)
    ate2 = metrics.ate_rmse(est2, gt, "sim3")

    print(json.dumps({
        "metric": "vo_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ASSUMPTION, 2),
        "extras": {
            "ate_sim3": round(ate, 4),
            "ate_sim3_scan": round(ate2, 4),
            "frames": n_frames,
            "device": str(jax.devices()[0]),
            "median_latency_ms": round(med_latency * 1e3, 2),
            "scan_wall_s": round(wall2, 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
