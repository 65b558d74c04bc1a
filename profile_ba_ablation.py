"""BA on/off ablation across five scene families (the reference's one
documented accuracy claim — "optimization improves accuracy",
/root/reference/README.md:216 — made quantitative; VERDICT r4 next #1).

Round-5 changes vs BA_ABLATION_r04.json:
- the round-5 frontend (exact block-2 nullspace, union motion gate) is
  what makes BA help: the r4 failure modes (adversarial drift doubling,
  noise-row regressions) do not reproduce on it;
- a chi2 re-gate between LM rounds (cfg.ba.regate_px) was built, measured
  across all five families, and REJECTED as a default — it cuts the
  long-baseline keyframe anchor links and regresses the noise rows; the
  artifact carries a ba_on_regate3 column so the decision is on record;
- write_back rejects window updates that yank the current pose beyond a
  trust region (cfg.ba.max_pose_correction; measured corrections are
  <2e-3, so 0.03 is a pure safety net);
- rows run with multiple pipeline seeds so BA-on vs BA-off ordering
  stands above the run-to-run band.

Run: python profile_ba_ablation.py   (CPU, ~40 min at 3 seeds)
Env: ABLATION_FRAMES, ABLATION_SEEDS, ABLATION_TPU=1 (run on the chip).
Writes BA_ABLATION_r05.json.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

if not os.environ.get("ABLATION_TPU"):
    jax.config.update("jax_platforms", "cpu")
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

N = int(os.environ.get("ABLATION_FRAMES", "150"))
SEEDS = list(range(int(os.environ.get("ABLATION_SEEDS", "3"))))
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

base = VOConfig()
VARIANTS = {
    "ba_on": base,                       # shipped defaults (regate off +
                                         # trust-region safety net)
    "ba_off": base.replace(ba=dataclasses.replace(base.ba, enabled=False)),
    # the chi2 re-gate, measured and rejected as a default (see
    # BAConfig.regate_px): kept in the artifact so the decision is visible
    "ba_on_regate3": base.replace(ba=dataclasses.replace(
        base.ba, regate_px=3.0)),
}

out = {"frames": N, "seeds": SEEDS,
       "device": str(jax.devices()[0]), "rows": {}}
for name, frames, gt in ROWS:
    length = metrics.trajectory_length(gt)
    fj = jnp.asarray(frames)
    row = {}
    for vname, cfg in VARIANTS.items():
        ates, drifts, fails = [], [], 0
        for seed in SEEDS:
            final, outs = run_sequence(cfg, cam, S.init_state(cfg, seed),
                                       fj, height=480, width=640)
            est = np.asarray(outs.T_w_c)
            if not (np.isfinite(est).all()
                    and int(np.asarray(final.stage)) == S.STAGE_TRACKING):
                fails += 1
                continue
            ates.append(float(metrics.ate_rmse(est, gt, "sim3") / length * 100))
            drifts.append(float(
                metrics.drift_curve(est, gt)[-1] / length * 100))
        row[vname] = {
            "ate_pct_mean": round(float(np.mean(ates)), 2) if ates else None,
            "ate_pct_each": [round(a, 2) for a in ates],
            "drift_final_pct_mean":
                round(float(np.mean(drifts)), 2) if drifts else None,
            "drift_final_pct_each": [round(d, 2) for d in drifts],
            "failed_seeds": fails,
        }
    if row["ba_on"]["ate_pct_mean"] is not None and \
            row["ba_off"]["ate_pct_mean"] is not None:
        row["ba_ate_improvement_pct"] = round(
            row["ba_off"]["ate_pct_mean"] - row["ba_on"]["ate_pct_mean"], 2)
        row["ba_drift_improvement_pct"] = round(
            row["ba_off"]["drift_final_pct_mean"]
            - row["ba_on"]["drift_final_pct_mean"], 2)
    out["rows"][name] = row
    print(name, json.dumps(row), flush=True)

with open("BA_ABLATION_r05.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote BA_ABLATION_r05.json")
