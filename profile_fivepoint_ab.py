"""Measured 5pt vs 8pt minimal-sample A/B for essential-matrix RANSAC
(VERDICT r3 next #7): pose accuracy at swept outlier fractions, on both
the exact-correspondence generator and rendered-image matches.

The default is 8pt (cheaper per hypothesis: least-squares nullspace vs
det-polynomial bracketing); the 5-point solver (ops/fivepoint.py) is the
cv::findEssentialMat parity path (Nister-class minimal samples,
epipolar_geometry.cpp:36-39). The question: at which outlier rates do
5-point minimal samples win end-to-end?

Run: python profile_fivepoint_ab.py   -> prints a table + JSON
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import twoview
from monocular_visual_odometry_tpu.ops.camera import Camera

cam = Camera.create(615.0, 615.0, 320.0, 240.0)
SEEDS = range(12)
OUTLIER_FRACS = [0.0, 0.2, 0.4, 0.6]
N_HYP = 256


def rot_err_deg(R_est, R_gt):
    c = (np.trace(R_est.T @ R_gt) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def t_err_deg(t_est, t_gt):
    t_est = t_est / (np.linalg.norm(t_est) + 1e-12)
    t_gt = t_gt / (np.linalg.norm(t_gt) + 1e-12)
    c = abs(float(t_est @ t_gt))           # sign-agnostic (monocular scale)
    return float(np.degrees(np.arccos(np.clip(c, 0, 1))))


results = {}
for frac in OUTLIER_FRACS:
    for minimal in ("8pt", "5pt"):
        rerrs, terrs, fails = [], [], 0
        for seed in SEEDS:
            sc = syn.synthesize_two_view(n=200, seed=seed, noise_px=0.5,
                                         outlier_frac=frac)
            key = jax.random.PRNGKey(seed)
            tv = twoview.estimate_relative_pose(
                jnp.asarray(sc.uv1, jnp.float32), jnp.asarray(sc.uv2, jnp.float32),
                jnp.ones(len(sc.uv1), bool), cam, key,
                threshold_px=1.0, n_hypotheses=N_HYP,
                essential_minimal=minimal)
            T_gt = sc.T_c1_c2             # camera2 pose in camera1 frame
            # estimate convention: x2 = R x1 + t (frame-2-from-frame-1)
            R_gt = np.linalg.inv(T_gt)[:3, :3]
            t_gt = np.linalg.inv(T_gt)[:3, 3]
            re = rot_err_deg(np.asarray(tv.R), R_gt)
            te = t_err_deg(np.asarray(tv.t), t_gt)
            if re > 5.0 or te > 10.0:
                fails += 1
            rerrs.append(re)
            terrs.append(te)
        results[f"outliers={frac}:{minimal}"] = {
            "rot_err_deg_med": round(float(np.median(rerrs)), 4),
            "rot_err_deg_p90": round(float(np.percentile(rerrs, 90)), 4),
            "t_dir_err_deg_med": round(float(np.median(terrs)), 4),
            "t_dir_err_deg_p90": round(float(np.percentile(terrs, 90)), 4),
            "fail_count": fails, "seeds": len(list(SEEDS)),
        }
        print(f"outliers={frac} {minimal}: "
              f"{json.dumps(results[f'outliers={frac}:{minimal}'])}", flush=True)

with open("FIVEPOINT_AB_r04.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote FIVEPOINT_AB_r04.json")
