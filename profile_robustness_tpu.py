"""On-chip robustness rows (VERDICT r3 next #9): run the severest
photometric perturbations of the family-A matrix on the REAL TPU chip and
compare against the CPU-measured values, backing docs/ROBUSTNESS.md's
"identical math on TPU via pinned precision" claim with a measurement.

Run (on the TPU host): python profile_robustness_tpu.py
Writes ROBUSTNESS_TPU_r04.json.
"""
import os, sys, json, time
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

N = int(os.environ.get("ROBUST_FRAMES", "150"))
K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)
cfg = VOConfig()

gt = syn.make_trajectory(N, seed=0, translation_step=0.05)
clean = np.stack([syn.render_frame(gt[i], syn.default_scene(0), K)
                  .astype(np.float32) for i in range(N)])
length = metrics.trajectory_length(gt)

# the severest settings of the matrix: heaviest noise + heaviest contrast
ROWS = [("noise", 20.0), ("low_contrast", 0.25), ("clean", 0.0)]
out = {"device": str(jax.devices()[0]), "frames": N, "rows": {}}
for kind, sev in ROWS:
    frames = clean if kind == "clean" else syn.perturb_frames(clean, kind, sev)
    st0 = S.init_state(cfg)
    t0 = time.perf_counter()
    final, outs = run_sequence(cfg, cam, st0, jnp.asarray(frames),
                               height=480, width=640)
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    est = np.asarray(outs.T_w_c)
    ate = metrics.ate_rmse(est, gt, "sim3")
    drift = metrics.drift_curve(est, gt)[-1]
    row = {"tracked": int(np.asarray(final.stage)) == S.STAGE_TRACKING,
           "ate_pct": round(float(ate / length * 100), 2),
           "drift_final_pct": round(float(drift / length * 100), 2),
           "wall_s_incl_compile": round(wall, 1)}
    out["rows"][f"{kind}:{sev}"] = row
    print(f"TPU {kind}:{sev} {json.dumps(row)}", flush=True)

with open("ROBUSTNESS_TPU_r04.json", "w") as f:
    json.dump(out, f, indent=2)
print("wrote ROBUSTNESS_TPU_r04.json")
