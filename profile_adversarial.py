"""Round-4 robustness matrix over THREE scene families (CPU) — writes
ROBUSTNESS_r04.json. Evaluate-only: family B/C were built after all
pipeline tuning and nothing is fitted to them (VERDICT r3 next #2).

  A benchmark   — default_scene + make_trajectory, clean + photometric
                  perturbation matrix (the r3 matrix, re-measured with the
                  round-4 defaults)
  B adversarial — adversarial_scene (repeated-texture wall, 1/f surfaces,
                  box/sphere occluders) x adversarial trajectory
                  (rotation-dominant + low-parallax segments), decomposed
                  per axis; each row in reference-parity config AND with
                  the two round-4 robustness features
                  (tracking.use_motion_model, match.method3_ambiguity_ratio)
  C planar      — planar_scene, both E/H selection rules

Run: python profile_adversarial.py   (~1 h CPU)
"""
import os, sys, json, dataclasses
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

N = int(os.environ.get("ROBUST_FRAMES", "150"))
NP = int(os.environ.get("ROBUST_FRAMES_PLANAR", "90"))
K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)

base = VOConfig()


def variant(mm=True, amb=1.0, ref_sel=False):
    return base.replace(
        tracking=dataclasses.replace(base.tracking, use_motion_model=mm),
        match=dataclasses.replace(base.match, method3_ambiguity_ratio=amb),
        init=dataclasses.replace(base.init, use_reference_selection=ref_sel))


def render(scene, gt):
    return np.stack([syn.render_frame(gt[i], scene, K).astype(np.float32)
                     for i in range(len(gt))])


def evaluate(frames, gt, cfg):
    final, outs = run_sequence(cfg, cam, S.init_state(cfg),
                               jnp.asarray(frames), height=480, width=640)
    est = np.asarray(outs.T_w_c)
    finite = bool(np.isfinite(est).all())
    length = metrics.trajectory_length(gt)
    ate = metrics.ate_rmse(est, gt, "sim3") if finite else float("inf")
    drift = metrics.drift_curve(est, gt)[-1] if finite else float("inf")
    ok = np.asarray(outs.tracking_ok)
    stg = np.asarray(outs.stage)
    init = int(np.argmax(stg == S.STAGE_TRACKING)) if (stg == 2).any() else -1
    return {
        "tracked": int(np.asarray(final.stage)) == S.STAGE_TRACKING,
        "finite": finite,
        "init_frame": init,
        "track_ok": (f"{int(ok[init:].sum())}/{len(gt) - init}"
                     if init >= 0 else "0/0"),
        "ate_pct": round(float(ate / length * 100), 2),
        "drift_final_pct": round(float(drift / length * 100), 2),
        "n_inliers_median": int(np.median(np.asarray(outs.n_inliers)[5:])),
    }


results = {"frames": N, "families": {}}

# ---- family A: benchmark scene + photometric matrix ------------------------
gtA = syn.make_trajectory(N, seed=0, translation_step=0.05)
clean = render(syn.default_scene(0), gtA)
famA = {}
for kind, sev in [("clean", 0.0), ("noise", 5.0), ("noise", 10.0),
                  ("noise", 20.0), ("blur", 3.0), ("blur", 7.0),
                  ("exposure", 0.5), ("exposure", 1.0),
                  ("low_contrast", 0.5), ("low_contrast", 0.25)]:
    frames = clean if kind == "clean" else syn.perturb_frames(clean, kind, sev)
    famA[f"{kind}:{sev}"] = evaluate(frames, gtA, variant())
    print("A", f"{kind}:{sev}", json.dumps(famA[f"{kind}:{sev}"]), flush=True)
results["families"]["A_benchmark"] = famA

# ---- family B: adversarial scene / trajectory, per axis --------------------
gtB = syn.make_adversarial_trajectory(N)
adv = syn.adversarial_scene()
combos = {
    "adv_scene+bench_traj": (render(adv, gtA), gtA),
    "bench_scene+adv_traj": (render(syn.default_scene(0), gtB), gtB),
    "adv_scene+adv_traj": (render(adv, gtB), gtB),
}
famB = {}
for name, (frames, gt) in combos.items():
    famB[name] = {
        # reference behavior: stale-pose projection, no ambiguity gate
        "reference_parity": evaluate(frames, gt, variant(mm=False, amb=1.0)),
        # round-4 default: constant-velocity prediction
        "default": evaluate(frames, gt, variant(mm=True, amb=1.0)),
        # + ambiguity gate (the repeated-texture rescue)
        "robust": evaluate(frames, gt, variant(mm=True, amb=0.8)),
    }
    print("B", name, json.dumps(famB[name]), flush=True)
results["families"]["B_adversarial"] = famB

# ---- family C: planar (homography-init) ------------------------------------
gtC = syn.make_planar_trajectory(NP)
framesC = render(syn.planar_scene(), gtC)
famC = {
    "tournament_rule": evaluate(framesC, gtC, variant(ref_sel=False)),
    "reference_rule": evaluate(framesC, gtC, variant(ref_sel=True)),
}
print("C", json.dumps(famC), flush=True)
results["families"]["C_planar"] = famC

with open("ROBUSTNESS_r04.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote ROBUSTNESS_r04.json")
