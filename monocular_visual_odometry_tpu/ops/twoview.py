"""Two-view relative-pose estimation with E/H model selection.

TPU-native replacement for the reference's "giant function"
``helperEstimatePossibleRelativePosesByEpipolarGeometry``
(``/root/reference/src/geometry/motion_estimation.cpp:11-157``) and its
satellites ``helperFindInlierMatchesByEpipolarCons`` (:182-198) and
``helperTriangulatePoints`` (:202-247):

1. run RANSAC for the essential matrix AND the homography,
2. recover candidate (R, t) from each (1 from E, up to 4 from H with
   cheirality pruning),
3. score E and H with the ORB-SLAM symmetric transfer errors,
4. pick H when score_H/(score_E+score_H) > 0.5, choosing the H solution
   with the largest |normal_z| (:139-154),
5. triangulate the winning model's inliers.

Instead of the reference's per-solution std::vector plumbing, every
candidate is evaluated in a fixed [5]-slot batch (1 E + 4 H) and the
winner is selected with masked argmax — no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_visual_odometry_tpu.ops import epipolar as epi
from monocular_visual_odometry_tpu.ops import lie, scoring
from monocular_visual_odometry_tpu.ops.camera import Camera, pixel2cam_norm_plane
from monocular_visual_odometry_tpu.ops.precision import f32_matmuls


class TwoViewResult(NamedTuple):
    R: jnp.ndarray          # [3,3] rotation frame1 -> frame2 (T_2_1)
    t: jnp.ndarray          # [3] unit translation
    inliers: jnp.ndarray    # [N] bool (winning model, score-refined)
    pts3d_c1: jnp.ndarray   # [N,3] triangulated points in camera-1 frame
    used_homography: jnp.ndarray  # scalar bool — semantics depend on the
    # selection rule: reference rule -> "the ORB-SLAM score ratio picked
    # H"; tournament rule -> "an H-seeded candidate won the robust-cost
    # tournament". For reference comparisons use ratio_prefers_h, which
    # always carries the ORB-SLAM ratio verdict regardless of rule.
    ratio_prefers_h: jnp.ndarray  # scalar bool — prefer_homography(score_e, score_h)
    score_e: jnp.ndarray
    score_h: jnp.ndarray
    E: jnp.ndarray          # [3,3]
    H: jnp.ndarray          # [3,3]
    plane_normal: jnp.ndarray  # [3] (H winner's normal; zeros if E used)

    @property
    def T_2_1(self) -> jnp.ndarray:
        return lie.rt_to_T(self.R, self.t)


@f32_matmuls
def estimate_relative_pose(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
    cam: Camera, key: jax.Array,
    *, threshold_px: float = 1.0, h_threshold_px: float = 3.0,
    n_hypotheses: int = 512, sigma: float = 1.0,
    use_reference_selection: bool = False, essential_minimal: str = "8pt",
) -> TwoViewResult:
    """Full E/H dual estimation + model selection on matched pixel
    correspondences (fixed capacity N, ``valid`` mask).

    Two selection rules (``use_reference_selection`` is jit-static):

    - ``False`` (default): multi-start robust-Sampson tournament — every
      candidate pose (1 from E, 4 from H) is GN-refined and the lowest
      robust cost wins. Strictly stronger than transfer-score selection on
      quasi-planar scenes (see inline comment below).
    - ``True``: the reference's ORB-SLAM rule verbatim
      (motion_estimation.cpp:134-156) — pick H when
      score_H/(score_E+score_H) > 0.5, and among the H decompositions the
      cheirality-plausible one with the largest |normal_z|; no refinement,
      exactly the reference's candidate set.
    """
    x1 = pixel2cam_norm_plane(uv1, cam)
    x2 = pixel2cam_norm_plane(uv2, cam)
    K = cam.K
    focal = (cam.fx + cam.fy) * 0.5
    th_n = threshold_px / focal
    k_e, k_h = jax.random.split(key)

    # --- essential path (estiMotionByEssential, epipolar_geometry.cpp:17-57)
    e_model = epi.estimate_essential(
        x1, x2, valid, k_e, threshold=th_n, n_hypotheses=n_hypotheses,
        minimal=essential_minimal,
    )
    R_e, t_e, _ = epi.recover_pose_from_E(e_model.model, x1, x2, e_model.inliers)

    # --- homography path (estiMotionByHomography, :90-128)
    h_model = epi.estimate_homography(
        uv1, uv2, valid, k_h, threshold_px=h_threshold_px, n_hypotheses=n_hypotheses
    )
    Rs_h, ts_h, ns_h, valid4 = epi.decompose_homography(h_model.model, K)

    # --- ORB-SLAM transfer scores (checkEssentialScore /
    # checkHomographyScore, :501-664): selection criterion in reference
    # mode, diagnostics in tournament mode
    Kinv = jnp.linalg.inv(K)
    F = Kinv.T @ e_model.model @ Kinv
    se = scoring.essential_score(F, uv1, uv2, e_model.inliers, sigma)
    sh = scoring.homography_score(h_model.model, uv1, uv2, h_model.inliers, sigma)
    ratio_h = scoring.prefer_homography(se.score, sh.score)

    if use_reference_selection:
        # --- reference rule (motion_estimation.cpp:134-156): ratio > 0.5
        # picks H; among H solutions keep cheirality-plausible ones
        # (removeWrongRtOfHomography, epipolar_geometry.cpp:59-88) and take
        # the largest |n_z| (:142-154). No refinement — raw candidates, as
        # in the reference.
        vis = epi.homography_visible_filter(ns_h, x1, h_model.inliers)
        h_ok = valid4 & vis
        h_ok = jnp.where(jnp.any(h_ok), h_ok, valid4)   # all pruned -> fall back
        h_idx = jnp.argmax(jnp.where(h_ok, jnp.abs(ns_h[:, 2]), -1.0))
        use_h = ratio_h & jnp.any(valid4)
        R = jnp.where(use_h, Rs_h[h_idx], R_e)
        t = jnp.where(use_h, ts_h[h_idx], t_e)
        best_h_idx = h_idx
    else:
        # --- multi-start refinement: all 5 candidate poses (1 E + 4 H) are
        # GN-refined on the essential manifold under robust Sampson error
        # over ALL matches, and the winner is the lowest robust cost. This
        # replaces the reference's pick-by-transfer-score with a strictly
        # stronger criterion: quasi-planar scenes — where the E family is
        # degenerate and scores are uninformative — are decided by which
        # basin actually fits the off-plane evidence.
        cand_R = jnp.concatenate([R_e[None], Rs_h], axis=0)   # [5,3,3]
        cand_t = jnp.concatenate([t_e[None], ts_h], axis=0)   # [5,3]
        huber = 2.0 * th_n

        refine = jax.vmap(
            lambda R0, t0: epi.refine_pose_sampson(
                R0, t0, x1, x2, valid, iterations=12, huber_delta=huber)
        )
        Rs_ref, ts_ref = refine(cand_R, cand_t)

        def robust_cost(R, t):
            # Candidate quality = MSAC (truncated quadratic) WITH
            # cheirality, after resolving the candidate's t sign by
            # positive-depth vote. Two measured failure modes of the old
            # unbounded-Huber cost (round 4, FIVEPOINT_AB_r04.json):
            # (1) Huber grows linearly with outlier residual, so at ~20%
            #     gross outliers a degenerate H pose that drags far
            #     outliers slightly closer beat the correct E pose (75 deg
            #     translation error vs the reference rule's 7 deg);
            # (2) Sampson error alone cannot separate an H decomposition
            #     from its MIRROR solution — both fit the plane exactly —
            #     only depth signs can.
            # Truncation bounds every outlier to the same constant and a
            # negative-depth point counts as a full outlier, so the winner
            # is the pose placing the most points in front of both
            # cameras within threshold — ORB-SLAM's CheckRT principle
            # (capped chi2 + visible-point count,
            # motion_estimation.cpp:501-664).
            T = lie.rt_to_T(R, t)
            pts = epi.triangulate(x1, x2, T)
            z1, z2 = epi.depths_in_two_views(pts, T)
            n_pos = jnp.sum(valid & (z1 > 0) & (z2 > 0))
            n_neg = jnp.sum(valid & (z1 < 0) & (z2 < 0))
            flip = n_neg > n_pos
            t = jnp.where(flip, -t, t)
            pos = jnp.where(flip, (z1 < 0) & (z2 < 0), (z1 > 0) & (z2 > 0))
            r = epi._sampson_residuals(R, t, x1, x2)   # |r| is t-sign invariant
            h2 = huber * huber
            c = jnp.where(pos, jnp.minimum(r * r, h2), h2)
            return jnp.sum(valid * c), t

        costs, ts_res = jax.vmap(robust_cost)(Rs_ref, ts_ref)
        cand_ok = jnp.concatenate([jnp.asarray([True]), valid4])
        costs = jnp.where(cand_ok, costs, jnp.inf)
        # E-vs-H with an H bias on near-ties: on a dominant plane the
        # plane-induced E family fits every correspondence as well as the
        # true pose (costs tie to noise), and a plain argmin can land on
        # a wrong family member; the H decomposition is the identified
        # solution there. Same asymmetry as ORB-SLAM's ratio threshold
        # 0.40-0.45 < 0.5 (motion_estimation.cpp:141 uses the
        # code-value 0.5; README.md:57 documents 0.45): E must be
        # MEANINGFULLY better to win. Measured: fixes the planar seed
        # where E tied at 56 deg t-error without affecting any
        # non-planar case (E's cost there is far below H's).
        # among H decompositions, near-ties (<=5%) resolve by max |n_z|:
        # for points ON the plane BOTH physical decompositions reproduce H
        # exactly and pass cheirality — Sampson/depth cannot separate a
        # solution from its mirror; the reference's frontal-plane prior
        # (max |normal_z|, motion_estimation.cpp:142-154) is the
        # disambiguator. Inert off-plane, where one H candidate clearly
        # wins or E does.
        ch = costs[1:]
        near_h = ch <= jnp.min(ch) * 1.05
        best_h = 1 + jnp.argmax(jnp.where(near_h, jnp.abs(ns_h[:, 2]), -1.0))
        e_wins = costs[0] < 0.95 * costs[best_h]
        best = jnp.where(e_wins, 0, best_h)
        R = Rs_ref[best]
        t = ts_res[best]
        use_h = best > 0
        best_h_idx = jnp.maximum(best - 1, 0)

    # --- cheirality: both rules resolve the t sign (and H's candidate
    # ambiguity residue) by positive-depth vote
    T_pos = lie.rt_to_T(R, t)
    pts_pos = epi.triangulate(x1, x2, T_pos)
    z1p, z2p = epi.depths_in_two_views(pts_pos, T_pos)
    n_pos = jnp.sum(valid & (z1p > 0) & (z2p > 0))
    n_neg = jnp.sum(valid & (z1p < 0) & (z2p < 0))
    flip = n_neg > n_pos
    t = jnp.where(flip, -t, t)
    T_2_1 = lie.rt_to_T(R, t)
    pts3d = jnp.where(flip, -pts_pos, pts_pos)
    z1, z2 = epi.depths_in_two_views(pts3d, T_2_1)

    # inliers of the winning model: Sampson gate + positive depths
    r_fin = epi._sampson_residuals(R, t, x1, x2)
    inl = valid & (jnp.abs(r_fin) < th_n) & (z1 > 0) & (z2 > 0)

    return TwoViewResult(
        R=R, t=t, inliers=inl, pts3d_c1=pts3d,
        used_homography=use_h, ratio_prefers_h=ratio_h,
        score_e=se.score, score_h=sh.score,
        E=e_model.model, H=h_model.model,
        plane_normal=jnp.where(use_h, ns_h[best_h_idx],
                               jnp.zeros(3, dtype=uv1.dtype)),
    )


@f32_matmuls
def find_inlier_matches_by_epipolar(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
    cam: Camera, key: jax.Array,
    *, threshold_px: float = 1.0, n_hypotheses: int = 256,
) -> jnp.ndarray:
    """E-RANSAC used purely as an outlier filter for the tracking-time
    triangulation stage (helperFindInlierMatchesByEpipolarCons,
    motion_estimation.cpp:182-198). Returns [N] bool."""
    x1 = pixel2cam_norm_plane(uv1, cam)
    x2 = pixel2cam_norm_plane(uv2, cam)
    focal = (cam.fx + cam.fy) * 0.5
    m = epi.estimate_essential(
        x1, x2, valid, key, threshold=threshold_px / focal, n_hypotheses=n_hypotheses
    )
    return m.inliers


@f32_matmuls
def epipolar_filter_known_pose(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
    cam: Camera, T_w_c1: jnp.ndarray, T_w_c2: jnp.ndarray,
    *, threshold_px: float = 1.0,
) -> jnp.ndarray:
    """Epipolar outlier gate using the *tracked* relative pose instead of a
    RANSAC re-estimate: |sampson(x1, x2; R, t)| < threshold.

    Cheaper drop-in for find_inlier_matches_by_epipolar at keyframe time —
    the reference re-runs cv::findEssentialMat there
    (helperFindInlierMatchesByEpipolarCons, motion_estimation.cpp:182-198)
    even though tracking has already produced the pose; with a known pose
    the RANSAC adds cost and sampling noise but no information.
    """
    x1 = pixel2cam_norm_plane(uv1, cam)
    x2 = pixel2cam_norm_plane(uv2, cam)
    T_2_1 = lie.relative_T(T_w_c2, T_w_c1)
    R, t = lie.T_to_rt(T_2_1)
    tn = t / (jnp.linalg.norm(t) + 1e-9)
    r = epi._sampson_residuals(R, tn, x1, x2)
    focal = (cam.fx + cam.fy) * 0.5
    return valid & (jnp.abs(r) < threshold_px / focal)


@f32_matmuls
def triangulate_with_pose(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray,
    cam: Camera, T_w_c1: jnp.ndarray, T_w_c2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate matches using the *known* relative pose from tracking
    (helperTriangulatePoints, motion_estimation.cpp:202-247).

    Returns (pts3d in WORLD frame [N,3], ok mask [N] — valid & positive
    depth in both views)."""
    x1 = pixel2cam_norm_plane(uv1, cam)
    x2 = pixel2cam_norm_plane(uv2, cam)
    T_2_1 = lie.relative_T(T_w_c2, T_w_c1)
    pts_c1 = epi.triangulate(x1, x2, T_2_1)
    z1, z2 = epi.depths_in_two_views(pts_c1, T_2_1)
    ok = valid & (z1 > 0) & (z2 > 0)
    pts_w = lie.transform_points(T_w_c1, pts_c1)
    return pts_w, ok


def triangulation_angles(pts3d_c1: jnp.ndarray, T_2_1: jnp.ndarray) -> jnp.ndarray:
    """Parallax angle (radians) between the two viewing rays per point
    (getViewAngle_ analogue used for the angle filter, vo.cpp:578-584)."""
    c1 = jnp.zeros(3, dtype=pts3d_c1.dtype)
    c2 = lie.inv_T(T_2_1)[:3, 3]  # camera-2 center in frame 1
    v1 = pts3d_c1 - c1
    v2 = pts3d_c1 - c2[None, :]
    return lie.angle_between(v1, v2)
