"""BA on/off ablation on sequences hard enough for the difference to show
(VERDICT r3 weak #6): on the clean 150-frame benchmark the ablation sits
inside the ~0.6pp run-to-run variance band (r4: 1.57% vs 1.57%), because
per-frame RANSAC-PnP + GN polish against the same fixed landmarks already
solves nearly the same camera-only problem the windowed BA re-solves. The
reference's one documented accuracy claim — "optimization improves
accuracy" (/root/reference/README.md:216) — is therefore tested where
per-frame PnP is actually noisy: heavy sensor noise (few, corrupted
inliers) and the out-of-family adversarial trajectory (rotation-dominant,
low-parallax — family B of ROBUSTNESS_r04.json).

Run: python profile_ba_ablation.py   (CPU)
Writes BA_ABLATION_r04.json.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

N = int(os.environ.get("ABLATION_FRAMES", "150"))
K3 = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)

gt_a = syn.make_trajectory(N, seed=0, translation_step=0.05)
clean_a = np.stack([syn.render_frame(gt_a[i], syn.default_scene(0), K3)
                    .astype(np.float32) for i in range(N)])

# family-B adversarial scene + trajectory (evaluate-only; see
# profile_adversarial.py / data/synthetic.py)
gt_b = syn.make_adversarial_trajectory(N, seed=1)
scene_b = syn.adversarial_scene(1)
frames_b = np.stack([syn.render_frame(gt_b[i], scene_b, K3)
                     .astype(np.float32) for i in range(N)])

ROWS = [
    ("benchmark_clean", clean_a, gt_a),
    ("benchmark_noise10", syn.perturb_frames(clean_a, "noise", 10.0), gt_a),
    ("benchmark_noise20", syn.perturb_frames(clean_a, "noise", 20.0), gt_a),
    ("adversarial", frames_b, gt_b),
    ("adversarial_noise10",
     syn.perturb_frames(frames_b, "noise", 10.0), gt_b),
]

out = {"frames": N, "rows": {}}
for name, frames, gt in ROWS:
    length = metrics.trajectory_length(gt)
    row = {}
    for ba_on in (True, False):
        cfg = VOConfig()
        cfg = cfg.replace(ba=dataclasses.replace(cfg.ba, enabled=ba_on))
        st0 = S.init_state(cfg)
        final, outs = run_sequence(cfg, cam, st0, jnp.asarray(frames),
                                   height=480, width=640)
        est = np.asarray(outs.T_w_c)
        ate = metrics.ate_rmse(est, gt, "sim3")
        drift = metrics.drift_curve(est, gt)
        key = "ba_on" if ba_on else "ba_off"
        row[key] = {
            "ate_pct": round(float(ate / length * 100), 2),
            "drift_final_pct": round(float(drift[-1] / length * 100), 2),
            "drift_p95_pct": round(
                float(np.percentile(drift, 95) / length * 100), 2),
            "tracked": int(np.asarray(final.stage)) == S.STAGE_TRACKING,
        }
    row["ba_ate_improvement_pct"] = round(
        row["ba_off"]["ate_pct"] - row["ba_on"]["ate_pct"], 2)
    out["rows"][name] = row
    print(name, json.dumps(row), flush=True)

with open("BA_ABLATION_r04.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote BA_ABLATION_r04.json")
