"""Round-5 robustness matrix — writes ROBUSTNESS_r05.json.

What changed vs r4 (profile_adversarial.py / ROBUSTNESS_r04.json):

1. **Family B is seed-powered** (VERDICT r4 weak #6 / next #2): every
   scene-family x profile row runs with >= 5 pipeline seeds; we report
   mean/min/max so profile-ordering claims stand above the run-to-run
   band (~1.5pp documented in docs/ROBUSTNESS.md).
2. **The union motion gate row** (TrackingConfig.motion_gate_union): the
   round-5 default gates matching around BOTH the predicted and the
   stale-pose projections — measured against reference-parity
   (stale-only) and r4's prediction-only gating.
3. **5pt end-to-end row** (VERDICT r4 next #7): essential_minimal="5pt"
   vs "8pt" on the repeated-texture-heavy adversarial scene with the
   ambiguity gate off — the high-outlier regime where the five-point
   solver's cleaner minimal draws should survive in-sequence.
4. **Undistortion row** (next #6): render -> distort -> undistort ->
   track (the reference's real data path; see tests/test_undistort_loop).

Run: python profile_robustness_r5.py          (CPU, ~1-2 h)
     ROBUST_SEEDS=2 ROBUST_FRAMES=100 python profile_robustness_r5.py  (quick)
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

if not os.environ.get("ROBUST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MVO_JAX_CACHE", "/tmp/mvo_jax_cache"))
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.data.tools import distort_image, undistort_image
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import run_sequence
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

N = int(os.environ.get("ROBUST_FRAMES", "150"))
SEEDS = list(range(int(os.environ.get("ROBUST_SEEDS", "5"))))
K3 = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
cam = Camera.create(615.0, 615.0, 320.0, 240.0)
base = VOConfig()


def variant(mm=True, union=True, amb=1.0, ref_sel=False, minimal="8pt"):
    return base.replace(
        tracking=dataclasses.replace(base.tracking, use_motion_model=mm,
                                     motion_gate_union=union),
        match=dataclasses.replace(base.match, method3_ambiguity_ratio=amb),
        init=dataclasses.replace(base.init, use_reference_selection=ref_sel),
        ransac=dataclasses.replace(base.ransac, essential_minimal=minimal))


PROFILES = {
    # reference behavior: stale-pose projection, no ambiguity gate
    "reference_parity": variant(mm=False, union=False, amb=1.0),
    # r4 default: prediction-only gate
    "predict_only": variant(mm=True, union=False, amb=1.0),
    # r5 default: union gate
    "default": variant(mm=True, union=True, amb=1.0),
    # + ambiguity gate (the repeated-texture rescue)
    "robust": variant(mm=True, union=True, amb=0.8),
}


def render(scene, gt):
    return np.stack([syn.render_frame(gt[i], scene, K3).astype(np.float32)
                     for i in range(len(gt))])


_CACHE = {}


def frames_for(name, builder, probe=None):
    """Disk-cached rendered sequence. ``probe`` (optional) renders ONLY
    frame 0; if it disagrees with the cached first frame the cache is
    stale (renderer/scene/trajectory code changed) and the sequence is
    re-rendered — the cache is keyed only by name+N, so without this
    check a code change would silently feed old frames into the
    artifact."""
    if name not in _CACHE:
        path = f"/tmp/mvo_rob5_{name}_{N}.npy"
        if os.path.exists(path):
            cached = np.load(path)
            if probe is None or np.array_equal(cached[0], probe()):
                _CACHE[name] = cached
            else:
                print(f"cache {name} stale — regenerated", flush=True)
                _CACHE[name] = builder()
                np.save(path, _CACHE[name])
        else:
            _CACHE[name] = builder()
            np.save(path, _CACHE[name])
    return _CACHE[name]


def evaluate(frames, gt, cfg, seeds=SEEDS):
    length = metrics.trajectory_length(gt)
    ates, drifts, inits, fails = [], [], [], 0
    for seed in seeds:
        final, outs = run_sequence(cfg, cam, S.init_state(cfg, seed),
                                   jnp.asarray(frames), height=480, width=640)
        est = np.asarray(outs.T_w_c)
        finite = bool(np.isfinite(est).all())
        tracked = int(np.asarray(final.stage)) == S.STAGE_TRACKING
        if not (finite and tracked):
            fails += 1
            continue
        ates.append(float(metrics.ate_rmse(est, gt, "sim3") / length * 100))
        drifts.append(float(metrics.drift_curve(est, gt)[-1] / length * 100))
        stg = np.asarray(outs.stage)
        inits.append(int(np.argmax(stg == S.STAGE_TRACKING)))
    if not ates:
        return {"failed_seeds": fails, "n_seeds": len(seeds)}
    return {
        "ate_pct_mean": round(float(np.mean(ates)), 2),
        "ate_pct_min": round(float(np.min(ates)), 2),
        "ate_pct_max": round(float(np.max(ates)), 2),
        "drift_final_pct_mean": round(float(np.mean(drifts)), 2),
        "init_frame_median": int(np.median(inits)),
        "failed_seeds": fails,
        "n_seeds": len(seeds),
    }


results = {"frames": N, "seeds": SEEDS, "families": {}}

# ---- family B (seed-powered, 4 profiles) -----------------------------------
gtA = syn.make_trajectory(N, seed=0, translation_step=0.05)
gtB = syn.make_adversarial_trajectory(N)
def _probe(scene_fn, gt):
    return lambda: syn.render_frame(gt[0], scene_fn(), K3).astype(np.float32)


combos = {
    "adv_scene+bench_traj": (
        frames_for("advA", lambda: render(syn.adversarial_scene(), gtA),
                   _probe(syn.adversarial_scene, gtA)), gtA),
    "bench_scene+adv_traj": (
        frames_for("benchB", lambda: render(syn.default_scene(0), gtB),
                   _probe(lambda: syn.default_scene(0), gtB)), gtB),
    "adv_scene+adv_traj": (
        frames_for("advB", lambda: render(syn.adversarial_scene(), gtB),
                   _probe(syn.adversarial_scene, gtB)), gtB),
}
famB = {}
for name, (frames, gt) in combos.items():
    famB[name] = {p: evaluate(frames, gt, cfg) for p, cfg in PROFILES.items()}
    print("B", name, json.dumps(famB[name]), flush=True)
results["families"]["B_adversarial"] = famB

# ---- benchmark sanity row (default must not regress the clean family) ------
clean = frames_for("cleanA", lambda: render(syn.default_scene(0), gtA),
                   _probe(lambda: syn.default_scene(0), gtA))
famA = {p: evaluate(clean, gtA, cfg) for p, cfg in PROFILES.items()}
print("A clean", json.dumps(famA), flush=True)
results["families"]["A_benchmark_clean"] = famA

# ---- 5pt vs 8pt end-to-end (high-outlier init regime) ----------------------
# repeated-texture-heavy adversarial scene, ambiguity gate OFF so the
# matcher feeds the initializer its aliased (outlier-heavy) match set
fiveE = {}
for minimal in ("8pt", "5pt"):
    cfg = variant(amb=1.0, minimal=minimal)
    fiveE[minimal] = evaluate(_CACHE["advB"], gtB, cfg)
print("fivepoint_e2e", json.dumps(fiveE), flush=True)
results["fivepoint_e2e"] = fiveE

# ---- undistortion in the loop ----------------------------------------------
DIST = np.array([-0.30, 0.09])


def _distorted():
    return np.stack([distort_image(f, K3, DIST) for f in clean]).astype(np.float32)


def _dist_probe():
    return distort_image(clean[0].astype(np.float64), K3,
                         DIST).astype(np.float32)


def _undistorted():
    return np.stack([undistort_image(f, K3, DIST)
                     for f in frames_for("distA", _distorted, _dist_probe)]
                    ).astype(np.float32)


def _undist_probe():
    return undistort_image(
        frames_for("distA", _distorted, _dist_probe)[0].astype(np.float64),
        K3, DIST).astype(np.float32)


# all three rows at the SAME seed count so the comparison is apples to
# apples (review r5: clean at 5 seeds vs dist rows at 3 skewed the table)
famU = {
    "clean": famA["default"],
    "distorted_raw": evaluate(frames_for("distA", _distorted, _dist_probe),
                              gtA, PROFILES["default"]),
    "undistorted": evaluate(frames_for("undistA", _undistorted,
                                       _undist_probe),
                            gtA, PROFILES["default"]),
}
print("undistort", json.dumps(famU), flush=True)
results["undistortion"] = famU

with open("ROBUSTNESS_r05.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote ROBUSTNESS_r05.json")
