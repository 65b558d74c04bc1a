"""The VO pipeline: per-frame step functions and the host-side engine.

TPU-native replacement for ``VisualOdometry::addFrame`` and its helpers
(``/root/reference/src/vo/vo_addFrame.cpp``, ``vo.cpp``): the FSM
BLANK -> DOING_INITIALIZATION -> DOING_TRACKING becomes three pure,
jit-compiled step functions over a single ``VOState`` pytree:

- :func:`step_first`     — first frame: detect, T=I, become the reference
  keyframe (vo_addFrame.cpp:30-35)
- :func:`step_init`      — two-view initialization attempt: match vs ref,
  E/H dual estimation + selection, triangulation-angle filter, quality
  gates, depth normalization (vo_addFrame.cpp:36-70, vo.cpp:53-170)
- :func:`step_track`     — frustum map scan, 3D-2D matching, RANSAC-PnP,
  pose-jump rejection, keyframe-need flag (vo_addFrame.cpp:71-91,
  vo.cpp:267-381)
- :func:`keyframe_update`— triangulate new points with the epipolar
  filter, PtConn reuse, map culling, reference switch
  (vo_addFrame.cpp:92-124, vo.cpp:482-576)

All branches are computed masked inside jit (no data-dependent Python
control flow); the host engine reads back one scalar per frame (the pose it
must record anyway) and dispatches stages / keyframe updates accordingly.
The in-place pointer mutation that is the reference's data flow
(vo.cpp:432-451) is replaced by functional state threading.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.ops import lie, matching, pnp, twoview
from monocular_visual_odometry_tpu.ops.camera import Camera, cam2pixel, in_frame
from monocular_visual_odometry_tpu.ops.features import FrameFeatures, features_from_config
from monocular_visual_odometry_tpu.utils.config import VOConfig

_DEG = jnp.pi / 180.0


def _masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries (inf if none)."""
    s = jnp.sort(jnp.where(mask, vals, jnp.inf))
    n = jnp.sum(mask)
    idx = jnp.maximum((n - 1) // 2, 0)
    return jnp.take(s, idx)


def _angle_filter(angles: jnp.ndarray, mask: jnp.ndarray, cfg: VOConfig) -> jnp.ndarray:
    """retainGoodTriangulationResult_ (vo.cpp:181-244): drop points with
    parallax < min_triang_angle or > max_ratio x median."""
    med = _masked_median(angles, mask)
    lo = cfg.triang.min_triang_angle_deg * _DEG
    hi = cfg.triang.max_ratio_angle_over_median * med
    return mask & (angles >= lo) & (angles <= hi)


def _tree_select(pred, a, b):
    """Elementwise where over two identical pytrees."""
    return jax.tree.map(lambda x, y: jnp.where(
        jnp.reshape(pred, (1,) * x.ndim) if x.ndim else pred, x, y), a, b)


def compact_mask(mask: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Fixed-shape stream compaction: indices of the True entries of
    ``mask`` [M], in ascending order, packed into a [capacity] int32 array
    padded with -1. Entries beyond ``capacity`` are dropped (capacity
    pressure, not an error). One cumsum + one scatter — O(M), no sort."""
    m = mask.shape[0]
    pos = jnp.cumsum(mask) - 1                                  # [M]
    return jnp.full(capacity, -1, jnp.int32).at[
        jnp.where(mask, pos, capacity)].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")


def scatter_links(base: jnp.ndarray, train_idx: jnp.ndarray,
                  values: jnp.ndarray) -> jnp.ndarray:
    """Scatter per-match values into per-keypoint slots, collision-safe.

    ``train_idx`` carries an argmin entry for EVERY query slot — dedup
    *losers* included (ops.matching.match_features) — so duplicate indices
    are routine, and XLA leaves duplicate-index ``.set`` order unspecified:
    a loser's sentinel (-1 link / False flag) could clobber the winner's
    value nondeterministically. Scatter-MAX is order-free because winners'
    values dominate the sentinel (links >= -1; bool max == OR). Reference
    semantics: the PtConn graph, pushCurrPointsToMap_ vo.cpp:541-574.
    """
    return base.at[train_idx].max(values, mode="drop")


# ---------------------------------------------------------------------------
# stage: first frame
# ---------------------------------------------------------------------------


def _step_first_impl(cfg: VOConfig, cam: Camera, st: S.VOState, img: jnp.ndarray):
    feats = features_from_config(img, cfg.orb)
    k = cfg.orb.max_keypoints
    eye = jnp.eye(4, dtype=jnp.float32)
    ring = st.ring.push(st.frame_idx % cfg.map.frame_buffer, eye, feats.kpts,
                        jnp.full(k, -1, jnp.int32), is_kf=True)
    new = st._replace(
        stage=jnp.asarray(S.STAGE_INITIALIZING, jnp.int32),
        frame_idx=st.frame_idx + 1,
        T_w_c=eye,
        ref_feats=feats,
        ref_pose=eye,
        ref_mp_idx=jnp.full(k, -1, jnp.int32),
        ref_frame_idx=st.frame_idx,
        last_keyframe_pose=eye,
        ring=ring,
    )
    new = S.push_keyframe(new, eye)
    out = S.StepOutput(
        T_w_c=eye, stage=new.stage, n_keypoints=feats.n_valid,
        n_matches=jnp.asarray(0, jnp.int32), n_inliers=jnp.asarray(0, jnp.int32),
        is_keyframe=jnp.asarray(True), tracking_ok=jnp.asarray(True),
        used_homography=jnp.asarray(False), n_map_points=new.map.n_valid,
        kpts=feats.kpts, kpt_valid=feats.valid,
        kpt_inlier=jnp.zeros(k, bool),
        ba_rejected_total=st.ba_rejected,
        n_candidates=jnp.asarray(0, jnp.int32),
    )
    return new, out


# ---------------------------------------------------------------------------
# stage: initialization attempt
# ---------------------------------------------------------------------------


def _step_init_impl(cfg: VOConfig, cam: Camera, st: S.VOState, img: jnp.ndarray):
    feats = features_from_config(img, cfg.orb)
    rng, k_est = jax.random.split(st.rng)
    ref = st.ref_feats

    m = matching.match_features(
        ref.desc, feats.desc, ref.valid, feats.valid, ref.kpts, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_init,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio,
        ambiguity_ratio=cfg.match.method3_ambiguity_ratio,
    )
    uv1 = ref.kpts[m.query_idx]
    uv2 = feats.kpts[m.train_idx]

    tv = twoview.estimate_relative_pose(
        uv1, uv2, m.valid, cam, k_est,
        threshold_px=cfg.ransac.threshold_px,
        n_hypotheses=cfg.ransac.n_hypotheses,
        use_reference_selection=cfg.init.use_reference_selection,
        essential_minimal=cfg.ransac.essential_minimal,
    )
    T_2_1 = lie.rt_to_T(tv.R, tv.t)
    angles = twoview.triangulation_angles(tv.pts3d_c1, T_2_1)
    good = _angle_filter(angles, tv.inliers, cfg)

    # init quality gates (isVoGoodToInit_, vo.cpp:112-170)
    n_good = jnp.sum(good)
    mean_disp = matching.mean_pixel_displacement(
        ref.kpts, feats.kpts, m._replace(valid=good))
    med_angle = _masked_median(angles, good)
    is_good = (
        (n_good >= cfg.init.min_inlier_matches)
        & (mean_disp > cfg.init.min_pixel_dist)
        & (med_angle > cfg.init.min_median_triang_angle_deg * _DEG)
    )

    # depth normalization: mean depth in the *current* frame -> assumed
    # mean depth (vo.cpp:101-109)
    pts_c2 = lie.transform_points(T_2_1, tv.pts3d_c1)
    mean_depth = jnp.sum(jnp.where(good, pts_c2[:, 2], 0.0)) / jnp.maximum(n_good, 1)
    scale = cfg.init.assumed_mean_depth / jnp.maximum(mean_depth, 1e-6)
    T_2_1_scaled = lie.rt_to_T(tv.R, tv.t * scale)
    T_w_c2 = st.ref_pose @ lie.inv_T(T_2_1_scaled)
    pts_w = lie.transform_points(st.ref_pose, tv.pts3d_c1 * scale)

    # push to map (pushCurrPointsToMap_, vo.cpp:528-576); all masked by the
    # gate so a failed attempt mutates nothing
    insert_mask = good & is_good
    desc_new = feats.desc[m.train_idx]
    cam_center = T_w_c2[:3, 3]
    nrm = pts_w - cam_center[None, :]
    nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9)
    new_map, slots = S.insert_map_points(st.map, pts_w, desc_new, nrm,
                                         insert_mask, frame_idx=st.frame_idx,
                                         gray=feats.gray[m.train_idx])

    k = cfg.orb.max_keypoints
    curr_mp = scatter_links(jnp.full(k, -1, jnp.int32), m.train_idx,
                            jnp.where(insert_mask, slots, -1))
    pose_out = jnp.where(is_good, T_w_c2, st.ref_pose)

    ring = st.ring.push(st.frame_idx % cfg.map.frame_buffer, pose_out,
                        feats.kpts, jnp.where(is_good, curr_mp, -1),
                        is_kf=is_good)

    succeeded = st._replace(
        stage=jnp.asarray(S.STAGE_TRACKING, jnp.int32),
        T_w_c=T_w_c2,
        ref_feats=feats,
        ref_pose=T_w_c2,
        ref_mp_idx=curr_mp,
        ref_frame_idx=st.frame_idx,
        last_keyframe_pose=T_w_c2,
        map=new_map,
    )
    succeeded = S.push_keyframe(succeeded, T_w_c2)
    unchanged = st._replace(T_w_c=st.ref_pose)
    new = _tree_select(is_good, succeeded, unchanged)
    new = new._replace(frame_idx=st.frame_idx + 1, ring=ring, rng=rng)

    kpt_inlier = scatter_links(jnp.zeros(k, bool), m.train_idx, good & is_good)
    out = S.StepOutput(
        T_w_c=pose_out, stage=new.stage, n_keypoints=feats.n_valid,
        n_matches=m.n_valid, n_inliers=n_good,
        is_keyframe=is_good, tracking_ok=jnp.asarray(True),
        used_homography=tv.used_homography, n_map_points=new.map.n_valid,
        kpts=feats.kpts, kpt_valid=feats.valid, kpt_inlier=kpt_inlier,
        ba_rejected_total=st.ba_rejected,
        n_candidates=jnp.asarray(0, jnp.int32),
    )
    return new, out


# ---------------------------------------------------------------------------
# stage: tracking (PnP against the local map)
# ---------------------------------------------------------------------------


def _step_track_impl(cfg: VOConfig, cam: Camera, st: S.VOState, img: jnp.ndarray,
               *, height: int, width: int):
    feats = features_from_config(img, cfg.orb)
    rng, k_pnp = jax.random.split(st.rng)

    # frustum scan pose (getMappointsInCurrentView_, vo.cpp:16-49, vmapped
    # over the whole pool). The reference projects with the stale previous
    # pose; with the constant-velocity model we PREDICT the current pose,
    # which keeps the radius gate centered under fast rotation (see
    # TrackingConfig.use_motion_model). With motion_gate_union the frustum
    # and the matching radius accept the UNION of both projections —
    # prediction covers steady rotation, the stale pose covers motion-model
    # overshoot at turn reversals (TrackingConfig.motion_gate_union).
    use_union = cfg.tracking.use_motion_model and cfg.tracking.motion_gate_union
    if cfg.tracking.use_motion_model:
        T_proj = st.T_w_c @ st.last_rel
    else:
        T_proj = st.T_w_c
    T_c_w_prev = lie.inv_T(T_proj)
    p_cam = lie.transform_points(T_c_w_prev, st.map.pts)
    proj = cam2pixel(p_cam, cam)
    candidates = st.map.valid & (p_cam[:, 2] > 0) & in_frame(proj, height, width)
    if use_union:
        p_cam_s = lie.transform_points(lie.inv_T(st.T_w_c), st.map.pts)
        proj_s = cam2pixel(p_cam_s, cam)
        ok_s = (p_cam_s[:, 2] > 0) & in_frame(proj_s, height, width)
        candidates = candidates | (st.map.valid & ok_s)
        # a behind-camera projection is a mirror artifact: it must not
        # ADMIT matches through the union radius gate — push it far away
        proj_s = jnp.where(ok_s[:, None], proj_s, 1e9)
        proj = jnp.where((p_cam[:, 2] > 0)[:, None], proj, 1e9)
    visible = st.map.visible + candidates.astype(jnp.int32)

    # Candidate compaction (TPU sizing, round 4): the matcher matmul and
    # the PnP hypothesis scoring both scale with the QUERY capacity, and
    # running them over the full 4096-slot pool paid 4x for slots that are
    # dead or out of frustum (the live map holds ~1000-1300 points under
    # cull pressure). A fixed-shape cumsum scatter packs the candidate
    # slots into a [C]-pool; C > the cull ceiling, so truncation is a
    # capacity-pressure corner (highest slots dropped for this frame
    # only). Reference semantics unchanged: candidate_mappoints_in_map,
    # vo.cpp:16-49 — just a dense pool instead of a sparse scan.
    M = st.map.pts.shape[0]
    C = cfg.map.track_candidates
    if C and C < M:
        comp_idx = compact_mask(candidates, C)
        comp_ok = comp_idx >= 0
        comp_safe = jnp.maximum(comp_idx, 0)
        cand_desc = st.map.desc[comp_safe]
        cand_proj = proj[comp_safe]
        cand_pts = st.map.pts[comp_safe]
        cand_proj_alt = proj_s[comp_safe] if use_union else None
    else:
        comp_idx = comp_safe = jnp.arange(M, dtype=jnp.int32)
        comp_ok = candidates
        cand_desc, cand_proj, cand_pts = st.map.desc, proj, st.map.pts
        cand_proj_alt = proj_s if use_union else None

    # 3D-2D matching: map descriptors vs current frame, radius-gated around
    # the projected positions (vo.cpp:283-289)
    m = matching.match_features(
        cand_desc, feats.desc, comp_ok, feats.valid, cand_proj, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_pnp,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio,
        ambiguity_ratio=cfg.match.method3_ambiguity_ratio,
        kpts1_alt=cand_proj_alt,
    )
    uv = feats.kpts[m.train_idx]

    res = pnp.solve_pnp_ransac(
        cand_pts, uv, m.valid, cam, k_pnp,
        threshold_px=cfg.ransac.pnp_reproj_threshold_px,
        n_hypotheses=cfg.ransac.pnp_n_hypotheses,
        min_inliers=cfg.ransac.pnp_min_inliers,
    )
    T_w_c_new = lie.inv_T(res.T_c_w)

    # pose-jump rejection vs previous frame (vo.cpp:357-369) and pose
    # freeze on failure (vo.cpp:376-379)
    jump = lie.pose_distance(T_w_c_new, st.T_w_c) > cfg.tracking.max_dist_to_prev_keyframe
    ok = res.ok & ~jump
    pose = jnp.where(ok, T_w_c_new, st.T_w_c)

    # counters + PtConn links for this frame (vo.cpp:334-352); inliers are
    # candidate-pool indexed — scatter back to pool slots
    matched_add = jnp.zeros(M, jnp.int32).at[comp_safe].add(
        (res.inliers & ok & comp_ok).astype(jnp.int32), mode="drop")
    new_map = st.map._replace(visible=visible, matched=st.map.matched + matched_add)
    k = cfg.orb.max_keypoints
    map_slot = comp_idx[m.query_idx]  # candidate pool -> map pool index
    curr_mp = scatter_links(jnp.full(k, -1, jnp.int32), m.train_idx,
                            jnp.where(res.inliers & ok, map_slot, -1))

    # keyframe rule (checkLargeMoveForAddKeyFrame_, vo.cpp:247-265)
    need_kf = ok & (
        lie.pose_distance(pose, st.last_keyframe_pose)
        > cfg.tracking.min_dist_between_keyframes
    )

    ring = st.ring.push(st.frame_idx % cfg.map.frame_buffer, pose, feats.kpts,
                        curr_mp, is_kf=need_kf)
    # constant-velocity update: measured frame-to-frame motion on success,
    # identity on failure (do not extrapolate a frozen pose)
    eye = jnp.eye(4, dtype=jnp.float32)
    last_rel = jnp.where(ok, lie.relative_T(st.T_w_c, pose), eye)
    new = st._replace(
        frame_idx=st.frame_idx + 1, T_w_c=pose, map=new_map, ring=ring,
        last_rel=last_rel, rng=rng
    )
    kpt_inlier = scatter_links(jnp.zeros(k, bool), m.train_idx,
                               res.inliers & ok)
    out = S.StepOutput(
        T_w_c=pose, stage=new.stage, n_keypoints=feats.n_valid,
        n_matches=m.n_valid, n_inliers=res.n_inliers,
        is_keyframe=need_kf, tracking_ok=ok,
        used_homography=jnp.asarray(False), n_map_points=new_map.n_valid,
        kpts=feats.kpts, kpt_valid=feats.valid, kpt_inlier=kpt_inlier,
        ba_rejected_total=st.ba_rejected,
        n_candidates=jnp.sum(candidates.astype(jnp.int32)),
    )
    return new, out, feats, curr_mp


# ---------------------------------------------------------------------------
# keyframe update: triangulate new points, cull, switch reference
# ---------------------------------------------------------------------------


def _keyframe_update_impl(cfg: VOConfig, cam: Camera, st: S.VOState,
                    feats: FrameFeatures, curr_mp: jnp.ndarray,
                    *, height: int, width: int):
    """vo_addFrame.cpp:92-124: match vs ref keyframe, epipolar-filter,
    triangulate with the tracked poses, angle-filter, insert with PtConn
    reuse, cull the map, make the current frame the new reference."""
    rng, k_epi = jax.random.split(st.rng)
    ref = st.ref_feats

    m = matching.match_features(
        ref.desc, feats.desc, ref.valid, feats.valid, ref.kpts, feats.kpts,
        method=cfg.match.method_index,
        max_pixel_dist=cfg.match.max_pixel_dist_triang,
        xiang_gao_ratio=cfg.match.xiang_gao_match_ratio,
        lowe_ratio=cfg.match.lowe_dist_ratio,
        ambiguity_ratio=cfg.match.method3_ambiguity_ratio,
    )
    uv1 = ref.kpts[m.query_idx]
    uv2 = feats.kpts[m.train_idx]

    # epipolar outlier filter. Default: Sampson gate with the tracked pose
    # (cheap, no sampling noise). Parity flag: the reference's E-RANSAC
    # re-estimate (helperFindInlierMatchesByEpipolarCons).
    if cfg.ransac.keyframe_use_ransac_filter:
        inl = twoview.find_inlier_matches_by_epipolar(
            uv1, uv2, m.valid, cam, k_epi,
            threshold_px=cfg.ransac.threshold_px,
            n_hypotheses=cfg.ransac.n_hypotheses // 2,
        )
    else:
        inl = twoview.epipolar_filter_known_pose(
            uv1, uv2, m.valid, cam, st.ref_pose, st.T_w_c,
            threshold_px=cfg.ransac.threshold_px,
        )

    pts_w, ok3d = twoview.triangulate_with_pose(
        uv1, uv2, inl, cam, st.ref_pose, st.T_w_c)
    T_2_1 = lie.relative_T(st.T_w_c, st.ref_pose)  # T_curr_ref
    pts_c1 = lie.transform_points(lie.inv_T(st.ref_pose), pts_w)
    angles = twoview.triangulation_angles(pts_c1, T_2_1)
    good = _angle_filter(angles, ok3d, cfg)

    # PtConn reuse: a ref keypoint already linked to a map point does not
    # spawn a duplicate (pushCurrPointsToMap_, vo.cpp:541-574)
    ref_links = st.ref_mp_idx[m.query_idx]
    reuse = good & (ref_links >= 0)
    fresh = good & (ref_links < 0)

    desc_new = feats.desc[m.train_idx]
    cam_center = st.T_w_c[:3, 3]
    nrm = pts_w - cam_center[None, :]
    nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9)
    new_map, slots = S.insert_map_points(st.map, pts_w, desc_new, nrm, fresh,
                                         frame_idx=st.frame_idx - 1,
                                         gray=feats.gray[m.train_idx])

    link_target = jnp.where(reuse, ref_links, jnp.where(fresh, slots, -1))
    curr_mp = scatter_links(curr_mp, m.train_idx, link_target)

    # map culling (optimizeMap_, vo.cpp:488-526)
    T_c_w = lie.inv_T(st.T_w_c)
    p_cam = lie.transform_points(T_c_w, new_map.pts)
    proj = cam2pixel(p_cam, cam)
    in_view = (p_cam[:, 2] > 0) & in_frame(proj, height, width)
    ratio = new_map.matched.astype(jnp.float32) / jnp.maximum(
        new_map.visible.astype(jnp.float32), 1.0)
    view_dir = new_map.pts - cam_center[None, :]
    view_dir = view_dir / (jnp.linalg.norm(view_dir, axis=-1, keepdims=True) + 1e-9)
    cosang = jnp.sum(view_dir * new_map.normals, axis=-1)
    angle_ok = cosang > jnp.cos(cfg.map.max_view_angle_deg * _DEG)
    keep = new_map.valid & in_view & (ratio >= st.erase_ratio) & angle_ok
    new_map = new_map._replace(valid=keep)

    n_pts = jnp.sum(keep)
    erase_ratio = jnp.where(
        n_pts > 1000, st.erase_ratio + 0.05,
        jnp.asarray(cfg.map.default_erase_ratio, jnp.float32))

    # update the ring entry for this frame with the final links
    slot = (st.frame_idx - 1) % cfg.map.frame_buffer
    ring = st.ring._replace(mp_idx=st.ring.mp_idx.at[slot].set(curr_mp))

    new = st._replace(
        ref_feats=feats,
        ref_pose=st.T_w_c,
        ref_mp_idx=curr_mp,
        ref_frame_idx=st.frame_idx - 1,
        last_keyframe_pose=st.T_w_c,
        map=new_map,
        ring=ring,
        erase_ratio=erase_ratio,
        rng=rng,
    )
    return S.push_keyframe(new, st.T_w_c)


# ---------------------------------------------------------------------------
# fused per-frame step: ONE device call per frame
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width", "mesh"))
def step_fused(cfg: VOConfig, cam: Camera, st: S.VOState, img: jnp.ndarray,
               *, height: int, width: int, mesh=None):
    """The whole per-frame pipeline as a single jit-compiled call: stage
    dispatch (lax.switch), tracking, windowed BA and keyframe update
    (lax.cond). One dispatch + one bulk readback per frame — essential
    when device dispatch has RPC latency (remote TPU) and desirable
    everywhere (no host round-trips between stages).

    ``mesh`` (jit-static): when a ``jax.sharding.Mesh`` is given, the
    windowed BA runs DISTRIBUTED — observation columns and landmark
    blocks sharded over the mesh's ``points`` axis, reduced camera system
    psum'd over ICI/DCN (parallel.dist_ba), honouring
    ``cfg.ba.fix_map_points`` exactly like the single-device path. The BA
    is computed unconditionally and applied with a masked select instead
    of lax.cond, keeping the collective schedule identical on every
    device and step. ``cfg.map.max_map_points`` and
    ``cfg.orb.max_keypoints`` must divide the mesh size.
    """

    def first_branch(st):
        new, out = _step_first_impl(cfg, cam, st, img)
        return new, out

    def init_branch(st):
        new, out = _step_init_impl(cfg, cam, st, img)
        return new, out

    def track_branch(st):
        new, out, feats, curr_mp = _step_track_impl(
            cfg, cam, st, img, height=height, width=width)
        if cfg.ba.enabled and mesh is not None:
            from monocular_visual_odometry_tpu.parallel.dist_ba import (
                ba_update_state_dist,
            )

            new = _tree_select(out.tracking_ok,
                               ba_update_state_dist(cfg, cam, mesh, new), new)
        elif cfg.ba.enabled:
            from monocular_visual_odometry_tpu.models.ba import ba_update_state

            new = jax.lax.cond(
                out.tracking_ok,
                lambda s: ba_update_state(cfg, cam, s),
                lambda s: s,
                new,
            )
        new = jax.lax.cond(
            out.is_keyframe,
            lambda s: _keyframe_update_impl(cfg, cam, s, feats, curr_mp,
                                            height=height, width=width),
            lambda s: s,
            new,
        )
        out = out._replace(T_w_c=new.T_w_c, n_map_points=new.map.n_valid,
                           ba_rejected_total=new.ba_rejected)
        return new, out

    # Geometry einsums/matmuls must be true f32: the TPU MXU's DEFAULT
    # precision computes f32 matmuls as one bf16 pass, which poisons the
    # Gram-based solves (triangulation BtB, 8-point AtA, BA/PnP normal
    # equations) at the 1e-2 relative level — measured 0.75 max
    # triangulation error vs 3e-4 at HIGHEST on v5e, and a 2.7x ATE
    # regression end-to-end. HIGHEST (6-pass f32) costs nothing material
    # here: the big matmul (the Hamming matcher) has explicit bf16 inputs
    # and is unaffected; every f32 contraction in the pipeline is tiny.
    # The context applies at trace time, so every branch traced inside
    # the switch (features, matching, PnP, BA, keyframe update) inherits.
    with jax.default_matmul_precision("highest"):
        return jax.lax.switch(
            st.stage, [first_branch, init_branch, track_branch], st)


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def step_tracking_batched(cfg: VOConfig, cam: Camera, sts: S.VOState,
                          imgs: jnp.ndarray, *, height: int, width: int):
    """Steady-state MULTI-STREAM tracking step: one device dispatch advances
    B independent, already-initialized VO streams by one frame each.

    The general fused step cannot batch efficiently: under vmap,
    ``lax.switch``/``lax.cond`` execute EVERY branch for the whole batch,
    so a B-stream step pays init+track+BA+keyframe per frame and aggregate
    fps stays flat (THROUGHPUT_r04.json: B=8 -> 1.0x). This specialization
    removes the FSM entirely — valid once every stream has initialized
    (stage == STAGE_TRACKING, the steady state of a serving deployment):

    - tracking runs unconditionally;
    - the windowed BA is computed unconditionally and applied by masked
      select (exactly what the mesh path already does, step_fused);
    - the keyframe update is computed unconditionally and applied by
      masked select on ``is_keyframe``.

    Per-frame work rises ~1.3x over the single-stream average (BA and the
    keyframe update always execute), in exchange for B-fold batching of
    every kernel. ``sts``/``imgs`` carry a leading [B] batch axis.
    """

    def one(st, img):
        new, out, feats, curr_mp = _step_track_impl(
            cfg, cam, st, img, height=height, width=width)
        if cfg.ba.enabled:
            from monocular_visual_odometry_tpu.models.ba import ba_update_state

            new = _tree_select(out.tracking_ok,
                               ba_update_state(cfg, cam, new), new)
        kf_new = _keyframe_update_impl(cfg, cam, new, feats, curr_mp,
                                       height=height, width=width)
        new = _tree_select(out.is_keyframe, kf_new, new)
        out = out._replace(T_w_c=new.T_w_c, n_map_points=new.map.n_valid,
                           ba_rejected_total=new.ba_rejected)
        return new, out

    with jax.default_matmul_precision("highest"):
        return jax.vmap(one)(sts, imgs)


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def run_sequences_batched(cfg: VOConfig, cam: Camera, sts: S.VOState,
                          frames: jnp.ndarray, *, height: int, width: int):
    """lax.scan of :func:`step_tracking_batched` over [B, N, H, W] frame
    stacks — B streams, N steps, one dispatch."""

    def body(s, imgs):
        return step_tracking_batched(cfg, cam, s, imgs,
                                     height=height, width=width)

    return jax.lax.scan(body, sts, jnp.swapaxes(frames, 0, 1))


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width", "mesh"))
def run_sequence(cfg: VOConfig, cam: Camera, st: S.VOState, frames: jnp.ndarray,
                 *, height: int, width: int, mesh=None):
    """Process a whole [N, H, W] frame stack in ONE device dispatch via
    lax.scan over the fused step — the offline/batch mode. Per-frame
    dispatch latency (significant on remote-attached TPUs) disappears
    entirely; the host gets back the final state plus stacked per-frame
    StepOutputs. ``mesh`` selects the distributed-BA step (see
    :func:`step_fused`)."""

    def body(s, img):
        s, out = step_fused(cfg, cam, s, img, height=height, width=width,
                            mesh=mesh)
        return s, out

    return jax.lax.scan(body, st, frames)


# jitted single-stage entry points (debugging / tests); the engine uses
# step_fused. Same true-f32 matmul pinning as step_fused.
def _f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **kw)
    return wrapped


step_first = functools.partial(jax.jit, static_argnames=("cfg",))(
    _f32_matmuls(_step_first_impl))
step_init = functools.partial(jax.jit, static_argnames=("cfg",))(
    _f32_matmuls(_step_init_impl))
step_track = functools.partial(
    jax.jit, static_argnames=("cfg", "height", "width"))(
    _f32_matmuls(_step_track_impl))
keyframe_update = functools.partial(
    jax.jit, static_argnames=("cfg", "height", "width"))(
    _f32_matmuls(_keyframe_update_impl))


# ---------------------------------------------------------------------------
# host-side engine
# ---------------------------------------------------------------------------


class VOEngine:
    """Host driver: threads VOState through the jitted stage functions.

    The single per-frame host<->device sync is the pose/status readback the
    caller needs anyway (trajectory recording, run_vo.cpp:140). Heavy
    compute never leaves the device.
    """

    def __init__(self, cfg: VOConfig, height: int, width: int, seed: int = 0,
                 fused: bool = True, mesh=None):
        self.cfg = cfg
        self.height = height
        self.width = width
        self.cam = Camera.create(cfg.dataset.fx, cfg.dataset.fy,
                                 cfg.dataset.cx, cfg.dataset.cy)
        self.state = S.init_state(cfg, seed)
        self.fused = fused
        self.mesh = mesh  # jax.sharding.Mesh -> distributed windowed BA
        if mesh is not None and not fused:
            raise ValueError("mesh mode requires the fused step")
        if cfg.ba.enabled:
            from monocular_visual_odometry_tpu.models.ba import ba_update_state
            self.ba_fn = ba_update_state
        else:
            self.ba_fn = None

    def add_frame(self, img: np.ndarray) -> S.StepOutput:
        """Process one grayscale image [H,W] (uint8 or float). Returns the
        StepOutput diagnostics, fetched to host in one transfer."""
        img = jnp.asarray(img, dtype=jnp.float32)
        if self.fused:
            self.state, out = step_fused(self.cfg, self.cam, self.state, img,
                                         height=self.height, width=self.width,
                                         mesh=self.mesh)
            return jax.device_get(out)
        return self._add_frame_staged(img)

    def _add_frame_staged(self, img: jnp.ndarray) -> S.StepOutput:
        """Multi-dispatch path (one jit call per stage) — DEBUG/PROFILING
        ONLY. It syncs the stage scalar and two bools to host every frame,
        so per-frame latency is dominated by dispatch round-trips; real
        runs must use the default fused path (``fused=True``)."""
        stage = int(self.state.stage)
        if stage == S.STAGE_BLANK:
            self.state, out = step_first(self.cfg, self.cam, self.state, img)
            return jax.device_get(out)
        if stage == S.STAGE_INITIALIZING:
            self.state, out = step_init(self.cfg, self.cam, self.state, img)
            return jax.device_get(out)
        self.state, out, feats, curr_mp = step_track(
            self.cfg, self.cam, self.state, img,
            height=self.height, width=self.width)
        if self.ba_fn is not None and bool(out.tracking_ok):
            self.state = self.ba_fn(self.cfg, self.cam, self.state)
            out = out._replace(T_w_c=self.state.T_w_c)
        if bool(out.is_keyframe):
            self.state = keyframe_update(
                self.cfg, self.cam, self.state, feats, curr_mp,
                height=self.height, width=self.width)
        return jax.device_get(out)
