"""Measure the 150-frame pipeline under adversarial photometric
perturbations (CPU) — sets the budgets for tests/test_robustness.py and
the matrix in docs/ROBUSTNESS.md. Run: python profile_robustness.py"""
import os, sys, json
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

N = int(os.environ.get("ROBUST_FRAMES", "150"))
planes = syn.default_scene(0)
K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
gt = syn.make_trajectory(N, seed=0, translation_step=0.05)
clean = np.stack([syn.render_frame(gt[i], planes, K).astype(np.float32)
                  for i in range(N)])
length = metrics.trajectory_length(gt)
cfg = VOConfig()
cam = VOEngine(cfg, 480, 640).cam

MATRIX = [
    ("clean", 0.0),
    ("noise", 5.0), ("noise", 10.0), ("noise", 20.0),
    ("blur", 3.0), ("blur", 7.0),
    ("exposure", 0.5), ("exposure", 1.0),
    ("low_contrast", 0.5), ("low_contrast", 0.25),
]

results = {}
for kind, sev in MATRIX:
    frames = clean if kind == "clean" else syn.perturb_frames(clean, kind, sev)
    st0 = S.init_state(cfg)
    final, outs = run_sequence(cfg, cam, st0, jnp.asarray(frames),
                               height=480, width=640)
    est = np.asarray(outs.T_w_c)
    tracked = int(np.asarray(final.stage)) == S.STAGE_TRACKING
    finite = bool(np.isfinite(est).all())
    ate = metrics.ate_rmse(est, gt, "sim3") if finite else float("inf")
    drift = metrics.drift_curve(est, gt)[-1] if finite else float("inf")
    key = f"{kind}:{sev}"
    results[key] = {"tracked": tracked, "ate": round(float(ate), 4),
                    "ate_pct": round(float(ate / length * 100), 2),
                    "drift_final_pct": round(float(drift / length * 100), 2),
                    "n_inliers_median": int(np.median(np.asarray(outs.n_inliers)[5:])),
                    "n_kpts_median": int(np.median(np.asarray(outs.n_keypoints)[5:]))}
    print(f"{key:20s} {json.dumps(results[key])}", flush=True)
print(json.dumps({"gt_length": round(float(length), 3), "results": results}))
