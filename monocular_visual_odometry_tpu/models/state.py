"""Fixed-capacity VO state pytrees.

TPU-native replacement for the reference's pointer-linked mutable objects
(``Frame`` /root/reference/include/my_slam/vo/frame.h, ``Map``/``MapPoint``
map.h/mappoint.h, the 20-frame deque ``frames_buff_`` vo.h:81-86, and the
``PtConn`` keypoint->mappoint graph frame.h:16-20): everything is a
structure-of-arrays pytree with validity masks and integer-id indirection,
so the whole VO state threads through jit-compiled step functions and can
be checkpointed as a single pytree (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from monocular_visual_odometry_tpu.ops.features import FrameFeatures
from monocular_visual_odometry_tpu.utils.config import VOConfig

# FSM stages (vo.h:47-53; LOST existed but was never entered — we keep the
# same three live states)
STAGE_BLANK = 0
STAGE_INITIALIZING = 1
STAGE_TRACKING = 2


class MapState(NamedTuple):
    """The local map: fixed pool of landmark slots (Map/MapPoint analogue).

    ``visible``/``matched`` are the culling counters of mappoint.h
    (visible_times_/matched_times_)."""

    pts: jnp.ndarray       # [M,3] world positions
    desc: jnp.ndarray      # [M,32] uint8 packed descriptors
    normals: jnp.ndarray   # [M,3] view direction at creation (normalized)
    visible: jnp.ndarray   # [M] int32
    matched: jnp.ndarray   # [M] int32
    valid: jnp.ndarray     # [M] bool
    gray: jnp.ndarray      # [M] f32 image intensity at creation — the
                           # grayscale analogue of MapPoint::color_
                           # (mappoint.h), used to shade the viewer's
                           # map-point cloud like the reference's PCL view
    created_idx: jnp.ndarray  # [M] int32 frame index at creation — lets the
                              # viewer show "newly triangulated" points red,
                              # as the reference's updateCurrPoints cloud
                              # (pcl_display.cpp:16-33)

    @property
    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "MapState":
        return MapState(
            pts=jnp.zeros((capacity, 3), jnp.float32),
            desc=jnp.zeros((capacity, 32), jnp.uint8),
            normals=jnp.zeros((capacity, 3), jnp.float32),
            visible=jnp.zeros(capacity, jnp.int32),
            matched=jnp.zeros(capacity, jnp.int32),
            valid=jnp.zeros(capacity, bool),
            gray=jnp.zeros(capacity, jnp.float32),
            created_idx=jnp.full(capacity, -1, jnp.int32),
        )


class FrameRing(NamedTuple):
    """Ring buffer of the last F frames' BA-relevant data (frames_buff_,
    vo.h:64,81-86 with kBuffSize_=20): pose, keypoints and the PtConn-style
    keypoint->mappoint links."""

    poses: jnp.ndarray      # [F,4,4] T_w_c
    kpts: jnp.ndarray       # [F,K,2]
    mp_idx: jnp.ndarray     # [F,K] int32, -1 = not linked to a map point
    occupied: jnp.ndarray   # [F] bool
    is_kf: jnp.ndarray      # [F] bool — frame was (or became) a keyframe;
                            # feeds the keyframe-window BA selection
                            # (models.ba.gather_window, cfg.ba.keyframe_window)

    @staticmethod
    def empty(n_frames: int, n_kpts: int) -> "FrameRing":
        return FrameRing(
            poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n_frames, 1, 1)),
            kpts=jnp.zeros((n_frames, n_kpts, 2), jnp.float32),
            mp_idx=jnp.full((n_frames, n_kpts), -1, jnp.int32),
            occupied=jnp.zeros(n_frames, bool),
            is_kf=jnp.zeros(n_frames, bool),
        )

    def push(self, slot: jnp.ndarray, pose: jnp.ndarray, kpts: jnp.ndarray,
             mp_idx: jnp.ndarray, is_kf=False) -> "FrameRing":
        return FrameRing(
            poses=self.poses.at[slot].set(pose),
            kpts=self.kpts.at[slot].set(kpts),
            mp_idx=self.mp_idx.at[slot].set(mp_idx),
            occupied=self.occupied.at[slot].set(True),
            is_kf=self.is_kf.at[slot].set(is_kf),
        )


class VOState(NamedTuple):
    """Complete VO engine state — a single pytree (functional analogue of
    the ``VisualOdometry`` object, vo.h:28-117)."""

    stage: jnp.ndarray       # scalar int32 (STAGE_*)
    frame_idx: jnp.ndarray   # scalar int32
    T_w_c: jnp.ndarray       # [4,4] current pose
    last_rel: jnp.ndarray    # [4,4] last frame-to-frame motion
                             # inv(T_prev) @ T_curr — the constant-velocity
                             # model used to PREDICT the current pose for
                             # the frustum scan + matching radius gate
                             # (cfg.tracking.use_motion_model). Identity
                             # after init or a failed track. The reference
                             # projects with the stale previous pose
                             # (vo.cpp:16-49), which collapses under fast
                             # rotation (~50px/frame image motion vs the
                             # 50px gate) — measured on the adversarial
                             # trajectory, docs/ROBUSTNESS.md.
    # reference keyframe (ref_, vo.h:62)
    ref_feats: FrameFeatures
    ref_pose: jnp.ndarray    # [4,4]
    ref_mp_idx: jnp.ndarray  # [K] int32 PtConn of the ref keyframe
    ref_frame_idx: jnp.ndarray  # scalar int32 — frame index of the ref
                                # keyframe (locates its ring slot so BA can
                                # re-sync ref_pose after optimization)
    last_keyframe_pose: jnp.ndarray  # [4,4] for the keyframe-distance rule
    map: MapState
    ring: FrameRing
    erase_ratio: jnp.ndarray  # scalar f32 (optimizeMap_'s adaptive ratio)
    rng: jnp.ndarray          # PRNG key
    # keyframe pose log (Map::keyframes_ analogue, map.h:18, kept as the
    # most recent max_keyframes poses) — feeds the viewer's red keyframe
    # markers (pcl_display.cpp:16-29)
    kf_poses: jnp.ndarray     # [Kf,4,4] T_w_c at keyframe insertion
    kf_count: jnp.ndarray     # scalar int32 (total ever inserted)
    # total BA window updates rejected by the write-back trust region
    # (cfg.ba.max_pose_correction) — a silently-always-firing trust gate
    # would turn BA into a paid no-op, so the count is surfaced through
    # StepOutput.ba_rejected_total (no-silent-caps practice)
    ba_rejected: jnp.ndarray  # scalar int32


class StepOutput(NamedTuple):
    """Per-frame diagnostics (the reference's printf observability,
    SURVEY.md §5.5, as data)."""

    T_w_c: jnp.ndarray        # [4,4]
    stage: jnp.ndarray        # int32 (stage AFTER this frame)
    n_keypoints: jnp.ndarray  # int32
    n_matches: jnp.ndarray    # int32
    n_inliers: jnp.ndarray    # int32
    is_keyframe: jnp.ndarray  # bool (tracking: large-move rule fired)
    tracking_ok: jnp.ndarray  # bool (PnP accepted)
    used_homography: jnp.ndarray  # bool (init only)
    n_map_points: jnp.ndarray # int32
    # current frame's keypoints + per-keypoint inlier flag, for the
    # drawResultByOpenCV-parity overlay (run_vo.cpp:202-217: all keypoints
    # green, inlier matches red)
    kpts: jnp.ndarray         # [K,2]
    kpt_valid: jnp.ndarray    # [K] bool
    kpt_inlier: jnp.ndarray   # [K] bool
    # running count of BA window updates rejected by the trust region
    # (VOState.ba_rejected after this frame)
    ba_rejected_total: jnp.ndarray  # int32
    # in-frustum map candidates BEFORE tracking-time compaction (0 outside
    # the tracking stage). When this exceeds cfg.map.track_candidates, the
    # highest pool slots are excluded from matching for that frame —
    # sustained capacity pressure must be visible, not silent (ADVICE r4;
    # the repo's no-silent-caps practice).
    n_candidates: jnp.ndarray  # int32


def empty_features(k: int) -> FrameFeatures:
    return FrameFeatures(
        kpts=jnp.zeros((k, 2), jnp.float32),
        scores=jnp.zeros(k, jnp.float32),
        angles=jnp.zeros(k, jnp.float32),
        levels=jnp.zeros(k, jnp.int32),
        desc=jnp.zeros((k, 32), jnp.uint8),
        valid=jnp.zeros(k, bool),
        gray=jnp.zeros(k, jnp.float32),
    )


def init_state(cfg: VOConfig, seed: int = 0) -> VOState:
    import jax

    k = cfg.orb.max_keypoints
    return VOState(
        stage=jnp.asarray(STAGE_BLANK, jnp.int32),
        frame_idx=jnp.asarray(0, jnp.int32),
        T_w_c=jnp.eye(4, dtype=jnp.float32),
        last_rel=jnp.eye(4, dtype=jnp.float32),
        ref_feats=empty_features(k),
        ref_pose=jnp.eye(4, dtype=jnp.float32),
        ref_mp_idx=jnp.full(k, -1, jnp.int32),
        ref_frame_idx=jnp.asarray(0, jnp.int32),
        last_keyframe_pose=jnp.eye(4, dtype=jnp.float32),
        map=MapState.empty(cfg.map.max_map_points),
        ring=FrameRing.empty(cfg.map.frame_buffer, k),
        erase_ratio=jnp.asarray(cfg.map.default_erase_ratio, jnp.float32),
        rng=jax.random.PRNGKey(seed),
        kf_poses=jnp.tile(jnp.eye(4, dtype=jnp.float32),
                          (cfg.map.max_keyframes, 1, 1)),
        kf_count=jnp.asarray(0, jnp.int32),
        ba_rejected=jnp.asarray(0, jnp.int32),
    )


def push_keyframe(st: "VOState", pose: jnp.ndarray) -> "VOState":
    """Append a pose to the keyframe log (ring over max_keyframes)."""
    slot = st.kf_count % st.kf_poses.shape[0]
    return st._replace(kf_poses=st.kf_poses.at[slot].set(pose),
                       kf_count=st.kf_count + 1)


def insert_map_points(
    m: MapState, pts: jnp.ndarray, desc: jnp.ndarray, normals: jnp.ndarray,
    mask: jnp.ndarray, frame_idx: jnp.ndarray | int = 0,
    gray: jnp.ndarray | None = None,
) -> tuple[MapState, jnp.ndarray]:
    """Functional map insertion (insertMapPoint, map.cpp:22-32).

    pts [C,3], desc [C,32], normals [C,3], mask [C] — inserts masked rows
    into free slots. Returns (new map, slot index per row, -1 if dropped).
    Slots are assigned deterministically (lowest-index free slots first).
    If the pool overflows, excess points are dropped (the reference's map
    would grow unboundedly; culling keeps both in check).
    """
    M = m.valid.shape[0]
    # free slots in ascending index order
    free_order = jnp.argsort(m.valid.astype(jnp.int32), stable=True)  # invalid first
    n_free = jnp.sum(~m.valid)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1          # rank among inserted
    can = mask & (pos < n_free)
    slot = jnp.where(can, free_order[jnp.clip(pos, 0, M - 1)], M)  # M -> dropped
    if gray is None:
        gray = jnp.zeros(pts.shape[0], jnp.float32)
    new = MapState(
        pts=m.pts.at[slot].set(pts, mode="drop"),
        desc=m.desc.at[slot].set(desc, mode="drop"),
        normals=m.normals.at[slot].set(normals, mode="drop"),
        visible=m.visible.at[slot].set(1, mode="drop"),
        matched=m.matched.at[slot].set(1, mode="drop"),
        valid=m.valid.at[slot].set(True, mode="drop"),
        gray=m.gray.at[slot].set(gray, mode="drop"),
        created_idx=m.created_idx.at[slot].set(
            jnp.asarray(frame_idx, jnp.int32), mode="drop"),
    )
    return new, jnp.where(can, slot, -1).astype(jnp.int32)
