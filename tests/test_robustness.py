"""Robustness matrix: the full 150-frame VO+BA pipeline under adversarial
photometric perturbations (sensor noise, motion blur, exposure drift, low
contrast).

This is the axis the reference itself fails on — it documents that TUM
fr1 'performances are bad' because real-image feature statistics starve
its frontend (/root/reference/README.md:212). The clean synthetic
renderer is friendly to FAST; these tests gate that accuracy survives
when the frames are pushed toward real-sensor statistics. Budgets were
set from the measured matrix in docs/ROBUSTNESS.md (profile_robustness.py)
with ~60% headroom. Marked slow (five 150-frame CPU runs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.models.vo import VOEngine, run_sequence
from monocular_visual_odometry_tpu.utils import metrics
from monocular_visual_odometry_tpu.utils.config import VOConfig

N = 150


@pytest.fixture(scope="module")
def clean_sequence():
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    gt = syn.make_trajectory(N, seed=0, translation_step=0.05)
    frames = np.stack([syn.render_frame(gt[i], planes, K).astype(np.float32)
                       for i in range(N)])
    return frames, gt


def _run(frames):
    cfg = VOConfig()
    cam = VOEngine(cfg, 480, 640).cam
    final, outs = run_sequence(cfg, cam, S.init_state(cfg),
                               jnp.asarray(frames), height=480, width=640)
    return final, np.asarray(outs.T_w_c)


# (kind, severity, ate budget %, end-drift budget %) — measured values in
# docs/ROBUSTNESS.md are ~2.5% / ~6-8%; budgets carry headroom.
# Measured run-to-run variance band (ADVICE r3): repeated identical runs
# move ATE by ~0.6pp (e.g. noise:10 measured 2.47% then 3.08% across
# rounds with no code path difference — the adaptive threshold cannot
# engage at std ~91.7; clean similarly moved 1.79% -> 1.67%). Budgets are
# therefore set >= measured + ~2x the band, and a single-run regression
# inside the band is not a code signal.
MATRIX = [
    ("noise", 10.0, 4.5, 12.0),        # high-gain CMOS noise
    ("blur", 7.0, 4.0, 10.0),          # 7px lateral motion blur
    ("exposure", 1.0, 4.0, 12.0),      # auto-exposure hunting
    ("low_contrast", 0.5, 4.5, 13.0),  # flat lighting / weak texture
    ("low_contrast", 0.25, 4.5, 13.0), # 4x squeeze: adaptive FAST threshold
    ("jpeg", 2.0, 4.5, 12.0),          # compressed stream (~quality 25):
                                       # blocking/ringing as structured
                                       # descriptor noise (measured 1.9-2.2%
                                       # ATE, inliers 108->87)
    ("vignette", 2.0, 4.5, 12.0),      # cos^8 illumination falloff (corner
                                       # gain 0.24): darkens exactly where
                                       # the rotation-phase matcher needs
                                       # corners (measured 2.2% ATE)
]


@pytest.mark.slow
@pytest.mark.parametrize("kind,sev,ate_budget,drift_budget", MATRIX)
def test_pipeline_survives_perturbation(clean_sequence, kind, sev,
                                        ate_budget, drift_budget):
    clean, gt = clean_sequence
    frames = syn.perturb_frames(clean, kind, sev)
    final, est = _run(frames)
    assert np.isfinite(est).all()
    assert int(np.asarray(final.stage)) == S.STAGE_TRACKING, (kind, sev)
    length = metrics.trajectory_length(gt)
    ate = metrics.ate_rmse(est, gt, "sim3")
    drift = metrics.drift_curve(est, gt)[-1]
    assert ate < ate_budget / 100 * length, (kind, sev, ate, length)
    assert drift < drift_budget / 100 * length, (kind, sev, drift, length)


def test_adaptive_threshold_rescues_low_contrast_detection():
    """The adaptive FAST threshold (docs/ROBUSTNESS.md) must keep the
    detector saturated under a 4x contrast squeeze — the starvation mode
    that produced median 185/1024 keypoints and 7 PnP inliers at the
    reference's fixed threshold 20 — while leaving a full-contrast frame
    bit-identical (std ~91 >= the 60-gray-level cap)."""
    from monocular_visual_odometry_tpu.ops.features import detect_and_describe

    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    gt = syn.make_trajectory(1, seed=0, translation_step=0.05)
    img = syn.render_frame(gt[0], planes, K).astype(np.float32)

    full = detect_and_describe(jnp.asarray(img))
    squeezed = img.mean() + 0.25 * (img - img.mean())
    low = detect_and_describe(jnp.asarray(squeezed))

    n_full = int(np.asarray(full.valid).sum())
    n_low = int(np.asarray(low.valid).sum())
    assert n_full >= 1000, n_full
    # before the adaptive threshold this was ~185; require near-saturation
    assert n_low >= 0.9 * n_full, (n_low, n_full)

    # full-contrast path is unchanged: the adaptive scale must actually
    # cap at 1.0 for this frame (std ~91 >= the 60-gray-level pivot) ...
    scale = float(jnp.clip(jnp.std(jnp.asarray(img)) / 60.0, 0.15, 1.0))
    assert scale == 1.0, scale
    # ... and the adaptive detector must agree with a DIRECT fixed-threshold
    # corner pass on the same atlas (bypassing the adaptive rule entirely)
    from monocular_visual_odometry_tpu.ops.features import (
        build_atlas, fast_corner_mask,
    )

    atlas = build_atlas(jnp.asarray(img), 4, 1.2, 16)
    fixed_mask = np.asarray(fast_corner_mask(atlas, 20.0))
    adaptive_mask = np.asarray(
        fast_corner_mask(atlas, 20.0 * jnp.clip(jnp.std(jnp.asarray(img))
                                                / 60.0, 0.15, 1.0)))
    np.testing.assert_array_equal(adaptive_mask, fixed_mask)


@pytest.mark.slow
def test_severe_low_contrast_degrades_gracefully(clean_sequence):
    """Below the 0.15 adaptive-threshold floor the detector CAN starve
    (near-flat frames, or noise-dominated std holding the scaled threshold
    above the true signal contrast). The property to keep is
    degrade-don't-diverge: every pose stays finite and the trajectory
    error stays bounded, even if accuracy is lost (ADVICE r3: severity
    beyond the adaptive rule's reach — 10x contrast squeeze PLUS sensor
    noise, so std is noise-dominated)."""
    clean, gt = clean_sequence
    frames = syn.perturb_frames(clean, "low_contrast", 0.1)
    frames = syn.perturb_frames(frames, "noise", 6.0)
    final, est = _run(frames)
    assert np.isfinite(est).all()
    # bounded, not accurate: within 30% of trajectory length after sim3
    length = metrics.trajectory_length(gt)
    ate = metrics.ate_rmse(est, gt, "sim3")
    assert ate < 0.30 * length, (ate, length)
