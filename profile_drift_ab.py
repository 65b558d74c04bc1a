"""A/B the BA window policy on the 150-frame benchmark (CPU): last-W-frames
vs current+last-(W-1)-keyframes. Working tool for the drift budget work.
Run: python profile_drift_ab.py"""
import os, sys, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence, VOEngine
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

planes = syn.default_scene(0)
K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
gt = syn.make_trajectory(150, seed=0, translation_step=0.05)
frames = jnp.asarray(np.stack([
    syn.render_frame(gt[i], planes, K).astype(np.float32) for i in range(150)]))
length = metrics.trajectory_length(gt)
print(f"gt length {length:.3f}")

for kfw in (False, True):
    for window in (5,) if not kfw else (5, 8):
        cfg = VOConfig()
        cfg = cfg.replace(ba=dataclasses.replace(
            cfg.ba, keyframe_window=kfw, window=window))
        eng = VOEngine(cfg, 480, 640)
        st0 = S.init_state(cfg)
        final, outs = run_sequence(cfg, eng.cam, st0, frames,
                                   height=480, width=640)
        est = np.asarray(outs.T_w_c)
        ate = metrics.ate_rmse(est, gt, "sim3")
        drift = metrics.drift_curve(est, gt)
        print(f"kf_window={kfw} W={window}: ate {ate:.4f} ({ate/length*100:.2f}%) "
              f"drift_final {drift[-1]:.4f} ({drift[-1]/length*100:.2f}%) "
              f"drift_p95 {np.percentile(drift,95):.4f}")
