"""Benchmark matrix on the synthetic benchmark sequence, on whatever device
JAX provides (the driver runs this on a real TPU chip).

Emits one JSON line per BASELINE.json config, headline LAST:

  cfg1 two_view_init   — init compute (detect x2 + match + E/H + select +
                         triangulate) latency on one pair
  cfg2 tracking_50     — 50-frame sequence, BA off (RANSAC-PnP tracking)
  cfg3 vo_no_ba_150    — full VO without BA, 150 frames (ATE + fps)
  cfg4 vo_ba_150       — full VO + windowed BA, 150 frames  <- HEADLINE

The BA on/off ATE ablation (cfg3 vs cfg4) is the reference's one
documented accuracy claim ("optimization improves accuracy",
/root/reference/README.md:216) made quantitative. Config 5 (multi-host
BA scaling) cannot run on one chip; see SCALING_r02.json +
parallel/scaling.py for the mesh-partition efficiency measurement.

Baseline note: the reference publishes no throughput at all (BASELINE.md)
— its interactive loop blocks on cv::waitKey + PCL spin every frame
(run_vo.cpp:220,310). 15 fps is the documented assumption for a C++/OpenCV
ORB pipeline of its shape on desktop CPU; the north-star target is >10x
that (BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_FPS_ASSUMPTION = 15.0
N_FRAMES = int(os.environ.get("MVO_BENCH_FRAMES", "150"))


def _emit(obj):
    print(json.dumps(obj), flush=True)


def main() -> int:
    import jax

    # persistent compilation cache: the scan programs take minutes to
    # compile on a tunneled TPU; repeated driver runs should not re-pay
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MVO_JAX_CACHE", "/tmp/mvo_jax_cache"))

    import jax.numpy as jnp

    from monocular_visual_odometry_tpu.data import synthetic as syn
    from monocular_visual_odometry_tpu.models import state as S
    from monocular_visual_odometry_tpu.models.vo import VOEngine, run_sequence
    from monocular_visual_odometry_tpu.utils import io as vio, metrics
    from monocular_visual_odometry_tpu.utils.config import VOConfig

    seq_dir = os.environ.get("MVO_BENCH_DIR", "/tmp/mvo_bench_seq150")
    if not os.path.exists(os.path.join(seq_dir, f"rgb_{N_FRAMES-1:05d}.png")):
        syn.render_sequence(seq_dir, n_frames=N_FRAMES, seed=0)
    gt = vio.read_trajectory(os.path.join(seq_dir, "cam_traj_truth.txt"))[:N_FRAMES]

    from monocular_visual_odometry_tpu.runtime import FrameLoader

    with FrameLoader(vio.image_paths(seq_dir, N_FRAMES), 480, 640) as loader:
        frames = np.stack([f.copy() for f in loader])
    stack = jnp.asarray(frames, dtype=jnp.float32)
    H, W = frames[0].shape
    device = str(jax.devices()[0])

    # ---- cfg1: two-view initialization on one pair ------------------------
    from monocular_visual_odometry_tpu.ops import matching, twoview
    from monocular_visual_odometry_tpu.ops.features import features_from_config

    cfg = VOConfig()
    cam = VOEngine(cfg, H, W).cam

    @jax.jit
    def init_pair(img1, img2, key):
        f1 = features_from_config(img1, cfg.orb)
        f2 = features_from_config(img2, cfg.orb)
        m = matching.match_features(
            f1.desc, f2.desc, f1.valid, f2.valid, f1.kpts, f2.kpts,
            method=cfg.match.method_index,
            max_pixel_dist=cfg.match.max_pixel_dist_init)
        tv = twoview.estimate_relative_pose(
            f1.kpts[m.query_idx], f2.kpts[m.train_idx], m.valid, cam, key,
            threshold_px=cfg.ransac.threshold_px,
            n_hypotheses=cfg.ransac.n_hypotheses)
        return tv.R, tv.t, tv.inliers

    key = jax.random.PRNGKey(0)
    jax.block_until_ready(init_pair(stack[0], stack[3], key))   # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(init_pair(stack[0], stack[3], key))
        times.append(time.perf_counter() - t0)
    _emit({"metric": "two_view_init_ms", "value": round(np.median(times) * 1e3, 2),
           "unit": "ms", "vs_baseline": None,
           "extras": {"config": 1, "device": device}})

    # ---- scan helper -------------------------------------------------------
    def scan_run(cfg, frames_jnp):
        st0 = S.init_state(cfg)
        out = run_sequence(cfg, cam, st0, frames_jnp, height=H, width=W)
        jax.block_until_ready(out)                               # compile+warm
        st0 = S.init_state(cfg)
        t0 = time.perf_counter()
        final, outs = run_sequence(cfg, cam, st0, frames_jnp, height=H, width=W)
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0
        return np.asarray(outs.T_w_c), wall

    cfg_noba = cfg.replace(ba=dataclasses.replace(cfg.ba, enabled=False))

    # ---- cfg2: 50-frame PnP tracking (BA off) ------------------------------
    n2 = min(50, N_FRAMES)
    est2, wall2 = scan_run(cfg_noba, stack[:n2])
    _emit({"metric": "tracking_fps_50", "value": round(n2 / wall2, 2),
           "unit": "frames/s", "vs_baseline": round(n2 / wall2 / REFERENCE_FPS_ASSUMPTION, 2),
           "extras": {"config": 2, "frames": n2,
                      "ate_sim3": round(metrics.ate_rmse(est2, gt[:n2], "sim3"), 4),
                      "device": device}})

    # ---- cfg3: full VO without BA ------------------------------------------
    est3, wall3 = scan_run(cfg_noba, stack)
    ate3 = metrics.ate_rmse(est3, gt, "sim3")
    _emit({"metric": "vo_no_ba_fps", "value": round(N_FRAMES / wall3, 2),
           "unit": "frames/s",
           "vs_baseline": round(N_FRAMES / wall3 / REFERENCE_FPS_ASSUMPTION, 2),
           "extras": {"config": 3, "frames": N_FRAMES, "ate_sim3": round(ate3, 4),
                      "device": device}})

    # ---- cfg4: full VO + windowed BA (HEADLINE) -----------------------------
    est4, wall4 = scan_run(cfg, stack)
    ate4 = metrics.ate_rmse(est4, gt, "sim3")
    drift = metrics.drift_curve(est4, gt)
    fps = N_FRAMES / wall4
    _emit({
        "metric": "vo_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ASSUMPTION, 2),
        "extras": {
            "config": 4,
            "frames": N_FRAMES,
            "ate_sim3": round(ate4, 4),
            "ate_sim3_no_ba": round(ate3, 4),
            "ba_ate_improvement": round(1.0 - ate4 / max(ate3, 1e-9), 3),
            "drift_final": round(float(drift[-1]), 4),
            "drift_p95": round(float(np.percentile(drift, 95)), 4),
            "gt_traj_length": round(metrics.trajectory_length(gt), 3),
            "scan_wall_s": round(wall4, 2),
            "device": device,
        },
    })
    return 0


if __name__ == "__main__":
    sys.exit(main())
