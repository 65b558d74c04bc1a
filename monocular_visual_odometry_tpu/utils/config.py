"""Typed configuration for the VO engine.

Replaces the reference's two overlapping string-typed YAML readers —
singleton flat ``Config`` (``/root/reference/src/basics/config.cpp``) and
hierarchical ``Yaml`` (``/root/reference/src/basics/yaml.cpp``) — with one
frozen dataclass tree.  Parameter names and defaults mirror
``/root/reference/config/config.yaml`` so a reference user can carry their
config over; booleans are real booleans (the reference used the strings
"true"/"false", config.cpp:39-46) and float thresholds are real floats (the
reference truncated them through ``get<int>``, feature_match.cpp:137-139 —
a quirk we deliberately do not replicate, SURVEY.md §7).

Capacity fields (max_keypoints, max_map_points, ...) are *static* for jit:
changing them recompiles; changing any float/int threshold does not (they
are passed into kernels as traced scalars where it matters).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml as _yaml


@dataclass(frozen=True)
class OrbConfig:
    """Feature detection (config.yaml:63-69, 94-95)."""

    num_keypoints: int = 8000            # number_of_keypoints_to_extract (candidate pool)
    max_keypoints: int = 1024            # max_number_of_keypoints (ref: 1500; we use a
                                         # power of two for MXU-friendly matcher tiles)
    scale_factor: float = 1.2            # pyramid scale
    n_levels: int = 4                    # level_pyramid
    score_threshold: float = 20.0        # FAST threshold
    grid_size: int = 16                  # kpts_uniform_selection_grid_size
    max_pts_per_grid: int = 8            # kpts_uniform_selection_max_pts_per_grid
    patch_size: int = 31                 # BRIEF sampling patch (ORB standard)
    harris_k: float = 0.04


@dataclass(frozen=True)
class MatchConfig:
    """Descriptor matching (config.yaml:71-91)."""

    method_index: int = 3                # 1=xiang-gao threshold BF, 2=Lowe ratio, 3=radius BF
    xiang_gao_match_ratio: float = 2.0   # dist_th = max(min_dist * ratio, 30)
    lowe_dist_ratio: float = 0.8
    max_pixel_dist_init: float = 100.0   # max_matching_pixel_dist_in_initialization
    max_pixel_dist_triang: float = 100.0
    max_pixel_dist_pnp: float = 50.0
    method3_ambiguity_ratio: float = 1.0 # Lowe-style ambiguity gate ON TOP
                                         # of the radius matcher (methods
                                         # 1/3): reject when
                                         # best >= ratio * second_best.
                                         # 1.0 = off (reference parity —
                                         # its radius matcher has no ratio
                                         # test, feature_match.cpp:86-124).
                                         # On EXACT repeated texture the
                                         # nearest descriptor is a coin
                                         # flip between the true match and
                                         # an alias (best == second == 0);
                                         # 0.8 rejects those ambiguous
                                         # matches and rescues tracking on
                                         # scene family B
                                         # (docs/ROBUSTNESS.md). Free: the
                                         # matcher already computes top-2.
    # NOTE: the reference's method_3_feature_dist_threshold is dead code
    # there too (the block applying it is commented out,
    # feature_match.cpp:164-179; methods 1 and 3 both use the xiang-gao
    # threshold) — so it is intentionally NOT a field here.


@dataclass(frozen=True)
class RansacConfig:
    """Essential/homography RANSAC (config.yaml:99-102) — batched-hypothesis
    formulation (fixed hypothesis count instead of adaptive early exit)."""

    threshold_px: float = 1.0            # findEssentialMat_threshold (pixels)
    n_hypotheses: int = 256              # hypothesis batch per model.
                                         # Sized to the post-radius-gate
                                         # outlier rate: at 30% outliers an
                                         # all-inlier 8-pt draw lands with
                                         # p=0.7^8≈0.057, so 256 draws miss
                                         # with p≈3e-7; the two batched
                                         # consensus-refit chains
                                         # (ops/epipolar.py) cover heavier
                                         # contamination. 512 bought no ATE
                                         # at 2x the init latency (the
                                         # per-hypothesis 9x9 eigh is the
                                         # init cost center on TPU).
    essential_minimal: str = "8pt"       # "5pt" = Nistér-class five-point
                                         # minimal samples (the
                                         # cv::findEssentialMat parity path,
                                         # ops/fivepoint.py), "8pt" =
                                         # eight-point minimal samples.
                                         # Measured A/B (FIVEPOINT_AB_r04,
                                         # 12 seeds x outlier sweep):
                                         # identical at 0% outliers; 5pt
                                         # wins from >=20% (t-dir 2.0 vs
                                         # 3.9 deg med at 20%, half the
                                         # failures at 40-60% — the
                                         # 0.8^5-vs-0.8^8 clean-draw odds).
                                         # 8pt stays default because the
                                         # radius-gated matcher leaves
                                         # <~10% outliers on the benchmark
                                         # (where they tie) and 8pt is ~2x
                                         # cheaper per hypothesis; switch
                                         # to "5pt" for heavy-outlier
                                         # regimes.
    # findEssentialMat_prob has no analogue: adaptive RANSAC termination is
    # replaced by the fixed hypothesis batch above (SURVEY.md §8.3); the
    # reference key is accepted and ignored by load_config.
    pnp_n_hypotheses: int = 256
    pnp_reproj_threshold_px: float = 2.0 # cv::solvePnPRansac threshold (vo.cpp:318)
    pnp_min_inliers: int = 5
    keyframe_use_ransac_filter: bool = False  # True = reference-style E-RANSAC
                                              # re-estimate at keyframe time;
                                              # False = Sampson gate with the
                                              # tracked pose (cheaper, no
                                              # sampling noise)


@dataclass(frozen=True)
class TriangulationConfig:
    """(config.yaml:104-106)."""

    min_triang_angle_deg: float = 1.0
    max_ratio_angle_over_median: float = 20.0


@dataclass(frozen=True)
class InitConfig:
    """Initialization quality gates (config.yaml:108-113)."""

    min_inlier_matches: int = 15
    min_pixel_dist: float = 50.0
    min_median_triang_angle_deg: float = 2.0
    assumed_mean_depth: float = 0.8      # assumed_mean_pts_depth_during_vo_init
    use_reference_selection: bool = False  # True = the reference's ORB-SLAM
                                           # E/H rule (score ratio + max
                                           # |n_z|, motion_estimation.cpp:
                                           # 134-156); False = robust-
                                           # Sampson tournament (see
                                           # ops.twoview, A/B'd in
                                           # tests/test_epipolar.py and
                                           # docs/PARITY.md)


@dataclass(frozen=True)
class TrackingConfig:
    """Keyframe / PnP safety thresholds (config.yaml:115-117)."""

    min_dist_between_keyframes: float = 0.03
    max_dist_to_prev_keyframe: float = 0.3
    use_motion_model: bool = True        # constant-velocity pose PREDICTION
                                         # for the map frustum scan and the
                                         # matching radius gate (T_pred =
                                         # T_prev @ last_rel). The reference
                                         # projects with the stale previous
                                         # pose (vo.cpp:16-49); under fast
                                         # rotation (4.5 deg/frame ~ 48 px
                                         # image motion at fx=615) the
                                         # 50 px gate then centers in the
                                         # wrong place and tracking dies —
                                         # measured on the adversarial
                                         # trajectory (docs/ROBUSTNESS.md).
                                         # Documented deviation; A/B'd on
                                         # the benchmark (no regression).
                                         # False = exact reference behavior.
    motion_gate_union: bool = True       # with use_motion_model: gate the
                                         # 3D-2D matching radius (and the
                                         # frustum scan) around the UNION
                                         # of the predicted and stale-pose
                                         # projections. The prediction
                                         # centers the gate under steady
                                         # fast rotation; the stale
                                         # projection covers constant-
                                         # velocity overshoot at turn
                                         # reversals — the measured failure
                                         # of prediction-only gating on the
                                         # adversarial trajectory
                                         # (ROBUSTNESS_r04 bench_scene+
                                         # adv_traj: 4.60% vs parity 2.94%).
                                         # Ignored when use_motion_model is
                                         # False (single stale gate =
                                         # reference behavior).


@dataclass(frozen=True)
class BAConfig:
    """Bundle adjustment (config.yaml:119-123)."""

    enabled: bool = True                 # is_enable_ba
    window: int = 5                      # num_prev_frames_to_opti_by_ba (<=20)
    information_matrix: tuple = (1.0, 0.0, 0.0, 1.0)
    fix_map_points: bool = True          # is_ba_fix_map_points
    iterations: int = 12                 # LM iterations (g2o used 50). The
                                         # windowed LM starts at the tracked
                                         # pose and converges in <=8-12:
                                         # on the 150-frame benchmark CPU
                                         # measures iters 8/12/20 identical
                                         # (ATE 1.58-1.59%); on the TPU chip
                                         # 12 is the knee (192.8 fps, ATE
                                         # 1.72%, BA improving over no-BA)
                                         # while 10 under-converges (ATE
                                         # 1.89%, BA slightly worse than
                                         # no-BA) and 20 costs 23 fps for
                                         # 0.1% ATE (docs/PARITY.md)
    huber_delta: float = 3.0             # robust kernel width (pixels·sqrt(info))
    obs_gate_px: float = 9.0             # hard residual gate on window
                                         # observations at gather time
                                         # (3x huber): tracking's RANSAC-PnP
                                         # hard-gates outlier links but the
                                         # windowed LM consumed EVERY ring
                                         # link with only soft Huber
                                         # weights, so under heavy sensor
                                         # noise stale/aliased links DRAGGED
                                         # the window (noise sigma=20: BA
                                         # made ATE 0.8pp WORSE before the
                                         # gate; BA_ABLATION_r04.json).
                                         # Same principle as ORB-SLAM's
                                         # chi2 edge removal in local BA.
                                         # 0 disables (pre-r4 behavior).
    init_lambda: float = 1e-3
    regate_px: float = 0.0               # iterative chi2 re-gate: after the
                                         # FIRST HALF of the LM iterations,
                                         # observations whose reprojection
                                         # residual at the CURRENT iterate
                                         # exceeds the gate are masked out
                                         # and the remaining iterations run
                                         # on the survivors — ORB-SLAM's
                                         # two-stage local BA (optimize,
                                         # drop chi2 outlier edges,
                                         # re-optimize). Addresses the
                                         # biased-window regime (ADVICE r4)
                                         # where gather-time obs_gate_px —
                                         # evaluated at the PRE-solve poses
                                         # — cannot catch links that only
                                         # become outliers once the window
                                         # moves. MEASURED AND OFF BY
                                         # DEFAULT (0): with the round-5
                                         # frontend (union motion gate +
                                         # exact nullspace) the stale-link
                                         # pathology it targeted no longer
                                         # appears, and an active gate cuts
                                         # the long-baseline keyframe
                                         # anchor links instead — ATE/drift
                                         # regressions on the noise rows
                                         # (BA_ABLATION_r05: noise20 ATE
                                         # 1.95 -> 3.03 with a 3 px gate).
                                         # regate_px is the FLOOR of the
                                         # gate; see regate_sigma_mult.
                                         # Unit-tested ON in test_ba.py for
                                         # the biased-window case it's for.
    regate_sigma_mult: float = 2.5       # the re-gate threshold is
                                         # max(regate_px, mult * median
                                         # residual at the current iterate)
                                         # — noise-calibrated, like chi2
                                         # with an estimated sigma. A FIXED
                                         # 3 px gate under heavy sensor
                                         # noise (sigma=20: inlier
                                         # residuals 4-6 px) throws away
                                         # good observations and made BA
                                         # WORSE than no-BA (measured,
                                         # BA_ABLATION r5 iteration); the
                                         # median-relative gate keeps the
                                         # bulk and cuts only the tail.
                                         # 0 = fixed gate (regate_px only).
    max_pose_correction: float = 0.03    # trust region on the BA result:
                                         # if the solved current-frame pose
                                         # moved more than this from the
                                         # tracked pose (pose_distance, same
                                         # metric as the tracking jump
                                         # reject vo.cpp:363-369), the
                                         # whole window update is REJECTED.
                                         # Windowed BA refines a pose that
                                         # RANSAC-PnP already placed within
                                         # noise; a correction at keyframe-
                                         # spacing scale (0.03) means the
                                         # window was dragged by stale/
                                         # aliased links, not improved.
                                         # 0 disables.
    deterministic: bool = False          # f64 accumulation of every Gram/
                                         # Schur/cost reduction. Purpose:
                                         # make the distributed and single-
                                         # device LM follow the SAME accept/
                                         # reject trajectory — f32 psum
                                         # partial sums differ from a single
                                         # device's summation order by
                                         # ~1e-7 relative, which the LM
                                         # accept branch amplifies into
                                         # divergent iterate paths (the
                                         # 10.5% final-cost gap in
                                         # MULTIHOST_r03.json). At f64 the
                                         # order noise (~1e-16) sits far
                                         # below every accept threshold, so
                                         # the trajectories coincide
                                         # (gated <1e-3 two-sided in
                                         # tests/test_multihost.py).
                                         # Requires jax_enable_x64 in the
                                         # process (otherwise the casts are
                                         # silent no-ops and the mode
                                         # degrades to the default);
                                         # verification-speed, not for the
                                         # per-frame hot path.
    keyframe_window: bool = True         # window = current frame + last W-1
                                         # KEYFRAME ring slots instead of the
                                         # last W frames — closer to the
                                         # reference's link-gated buffered-
                                         # frame selection (vo.cpp:417-453)
                                         # and spans more baseline per window.
                                         # A/B on the 150-frame benchmark
                                         # (profile_drift_ab.py): ATE 2.24%
                                         # -> 1.79%, end drift 8.75% ->
                                         # 3.20% of trajectory length.


@dataclass(frozen=True)
class MapConfig:
    """Local-map capacities and culling (vo.cpp:488-526).  Capacities are
    static-shape pools; the reference's analogues are the ~1000-point
    adaptive cull and the 20-frame ring buffer (vo.h:64)."""

    max_map_points: int = 4096
    default_erase_ratio: float = 0.1     # match-ratio cull threshold
    max_view_angle_deg: float = 45.0
    frame_buffer: int = 20               # kBuffSize_
    max_keyframes: int = 64              # stored keyframe pose capacity
    track_candidates: int = 1536         # tracking-time candidate pool: the
                                         # in-frustum map points are
                                         # compacted (fixed-shape cumsum
                                         # scatter) to this capacity before
                                         # the 3D-2D matcher and PnP, so
                                         # their cost scales with the LIVE
                                         # map (~1000-1300 points under
                                         # cull pressure, vo.cpp:488-526),
                                         # not the 4096-slot pool. 0
                                         # disables compaction. Overflow
                                         # beyond capacity drops the
                                         # highest pool slots (newest
                                         # insertions) for that frame only
                                         # — they stay in the map.


@dataclass(frozen=True)
class DatasetConfig:
    """Per-dataset section (config.yaml:10-40)."""

    dataset_dir: str = ""
    num_images: int = 150
    fx: float = 615.0
    fy: float = 615.0
    cx: float = 320.0
    cy: float = 240.0
    height: int = 480
    width: int = 640
    is_draw_true_traj: bool = False
    true_traj_filename: str = ""


@dataclass(frozen=True)
class VOConfig:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    orb: OrbConfig = field(default_factory=OrbConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    ransac: RansacConfig = field(default_factory=RansacConfig)
    triang: TriangulationConfig = field(default_factory=TriangulationConfig)
    init: InitConfig = field(default_factory=InitConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    ba: BAConfig = field(default_factory=BAConfig)
    map: MapConfig = field(default_factory=MapConfig)
    max_num_imgs_to_proc: int = 300
    save_predicted_traj_to: str = "output/cam_traj.txt"
    output_folder: str = "output"

    def replace(self, **kw) -> "VOConfig":
        return dataclasses.replace(self, **kw)


def _b(v: Any) -> bool:
    """Accept real bools and the reference's string bools."""
    if isinstance(v, str):
        return v.strip().lower() == "true"
    return bool(v)


# Every flat key load_config consumes, plus the reference keys it accepts
# and deliberately ignores (documented inline in the loader below). Used
# for typo detection: the reference THROWS on a missing key
# (/root/reference/src/basics/config.cpp:31-37; yaml.cpp:58-71 exits), so
# a misspelled key there fails loudly; with defaults-based loading the
# equivalent safety is an unknown-key warning.
_KNOWN_FLAT_KEYS = {
    "dataset_name", "dataset",
    "max_num_imgs_to_proc", "save_predicted_traj_to", "output_folder",
    # display-loop keys with no offline analogue (run_vo.cpp:103-109)
    "is_pcl_wait_for_keypress", "cv_waitkey_time",
    "number_of_keypoints_to_extract", "max_number_of_keypoints",
    "scale_factor", "level_pyramid", "score_threshold",
    # the reference reads one per-stage matcher index but uses only the
    # flat one due to its own index bug (vo_addFrame.cpp:98, SURVEY.md §7)
    "feature_match_method_index",
    "feature_match_method_index_initialization",
    "feature_match_method_index_triangulation",
    "feature_match_method_index_pnp",
    "xiang_gao_method_match_ratio", "lowe_method_dist_ratio",
    "method_3_feature_dist_threshold",  # dead in the reference too
    "max_matching_pixel_dist_in_initialization",
    "max_matching_pixel_dist_in_triangulation",
    "max_matching_pixel_dist_in_pnp",
    "kpts_uniform_selection_grid_size",
    "kpts_uniform_selection_max_pts_per_grid",
    "findEssentialMat_prob",  # adaptive termination -> fixed batch
    "findEssentialMat_threshold",
    "min_triang_angle", "max_ratio_between_max_angle_and_median_angle",
    "min_inlier_matches", "min_pixel_dist",
    "min_median_triangulation_angle",
    "assumed_mean_pts_depth_during_vo_init",
    "min_dist_between_two_keyframes", "max_possible_dist_to_prev_keyframe",
    "is_enable_ba", "num_prev_frames_to_opti_by_ba", "information_matrix",
    "is_ba_fix_map_points", "UPDATE_MAP_PTS",
}

_KNOWN_SECTION_KEYS = {
    "dataset_dir", "num_images", "camera_info.fx", "camera_info.fy",
    "camera_info.cx", "camera_info.cy", "height", "width",
    "is_draw_true_traj", "true_traj_filename",
}


def load_config(path: str | Path) -> VOConfig:
    """Load a YAML config.  Accepts both this framework's nested layout and
    the reference's flat layout (same key names, ``dataset_name`` section
    selection as in run_vo.cpp:66-69).

    Strictness (reference parity): a ``dataset_name`` that selects a
    missing section raises ``KeyError`` (the reference exits,
    yaml.cpp:58-71); unknown scalar keys raise a ``UserWarning`` (the
    closest defaults-based analogue of the reference's throw-on-missing-key,
    config.cpp:31-37 — a typo'd key must not silently fall back to the
    default). Mapping-valued top-level keys are dataset sections and may
    coexist unselected, as in the reference file.
    """
    import warnings

    with open(path) as f:
        text = f.read()
    # The reference files start with the cv::FileStorage "%YAML:1.0" directive,
    # which PyYAML rejects; strip it for compatibility.
    lines = [ln for ln in text.splitlines() if not ln.startswith("%YAML")]
    raw = _yaml.safe_load("\n".join(lines)) or {}

    for k, v in raw.items():
        if isinstance(v, dict):
            if k == "dataset":
                continue  # validated by the DatasetConfig ctor below
            unknown = set(v) - _KNOWN_SECTION_KEYS
            if unknown:
                warnings.warn(
                    f"config {path}: unknown key(s) in dataset section "
                    f"'{k}': {sorted(unknown)}", stacklevel=2)
        elif v is None:
            # a bare "name:" line is an (empty) dataset section — selected
            # or not, sections may coexist (as in the reference file); a
            # typo'd PARAMETER always carries a value, so no warning here
            pass
        elif k not in _KNOWN_FLAT_KEYS:
            warnings.warn(f"config {path}: unknown key '{k}' "
                          "(typo? it will have no effect)", stacklevel=2)

    ds = DatasetConfig()
    if "dataset_name" in raw:
        if raw["dataset_name"] not in raw:
            raise KeyError(
                f"config {path}: dataset_name={raw['dataset_name']!r} "
                "selects a section that does not exist "
                "(reference behavior: Yaml::get_ exits, yaml.cpp:58-71)")
        # a PRESENT but empty section ("matlab:" with no keys) parses to
        # None — that is not the reference's missing-key exit condition;
        # load it as all-defaults
        sec = raw[raw["dataset_name"]] or {}
        if not isinstance(sec, dict):
            raise KeyError(
                f"config {path}: dataset section "
                f"{raw['dataset_name']!r} is not a mapping")
        ds = DatasetConfig(
            dataset_dir=sec.get("dataset_dir", ""),
            num_images=int(sec.get("num_images", 150)),
            fx=float(sec.get("camera_info.fx", 615.0)),
            fy=float(sec.get("camera_info.fy", 615.0)),
            cx=float(sec.get("camera_info.cx", 320.0)),
            cy=float(sec.get("camera_info.cy", 240.0)),
            is_draw_true_traj=_b(sec.get("is_draw_true_traj", False)),
            true_traj_filename=sec.get("true_traj_filename", ""),
        )
    elif "dataset" in raw:
        ds = DatasetConfig(**raw["dataset"])

    g = raw.get  # flat reference keys
    cfg = VOConfig(
        dataset=ds,
        orb=OrbConfig(
            num_keypoints=int(g("number_of_keypoints_to_extract", 8000)),
            max_keypoints=int(g("max_number_of_keypoints", 1024)),
            scale_factor=float(g("scale_factor", 1.2)),
            n_levels=int(g("level_pyramid", 4)),
            score_threshold=float(g("score_threshold", 20.0)),
            grid_size=int(g("kpts_uniform_selection_grid_size", 16)),
            max_pts_per_grid=int(g("kpts_uniform_selection_max_pts_per_grid", 8)),
        ),
        match=MatchConfig(
            method_index=int(g("feature_match_method_index", 3)),
            xiang_gao_match_ratio=float(g("xiang_gao_method_match_ratio", 2.0)),
            lowe_dist_ratio=float(g("lowe_method_dist_ratio", 0.8)),
            max_pixel_dist_init=float(g("max_matching_pixel_dist_in_initialization", 100.0)),
            max_pixel_dist_triang=float(g("max_matching_pixel_dist_in_triangulation", 100.0)),
            max_pixel_dist_pnp=float(g("max_matching_pixel_dist_in_pnp", 50.0)),
        ),
        ransac=RansacConfig(
            # findEssentialMat_prob is accepted but ignored (fixed-batch RANSAC)
            threshold_px=float(g("findEssentialMat_threshold", 1.0)),
        ),
        triang=TriangulationConfig(
            min_triang_angle_deg=float(g("min_triang_angle", 1.0)),
            max_ratio_angle_over_median=float(g("max_ratio_between_max_angle_and_median_angle", 20.0)),
        ),
        init=InitConfig(
            min_inlier_matches=int(g("min_inlier_matches", 15)),
            min_pixel_dist=float(g("min_pixel_dist", 50.0)),
            min_median_triang_angle_deg=float(g("min_median_triangulation_angle", 2.0)),
            assumed_mean_depth=float(g("assumed_mean_pts_depth_during_vo_init", 0.8)),
        ),
        tracking=TrackingConfig(
            min_dist_between_keyframes=float(g("min_dist_between_two_keyframes", 0.03)),
            max_dist_to_prev_keyframe=float(g("max_possible_dist_to_prev_keyframe", 0.3)),
        ),
        ba=BAConfig(
            enabled=_b(g("is_enable_ba", True)),
            window=int(g("num_prev_frames_to_opti_by_ba", 5)),
            information_matrix=tuple(
                float(x) for x in str(g("information_matrix", "1.0 0.0 0.0 1.0")).split()
            ),
            fix_map_points=_b(g("is_ba_fix_map_points", True)),
        ),
        max_num_imgs_to_proc=int(g("max_num_imgs_to_proc", 300)),
        save_predicted_traj_to=g("save_predicted_traj_to", "output/cam_traj.txt"),
        output_folder=g("output_folder", "output"),
    )
    return cfg
