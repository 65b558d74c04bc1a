"""Sliding-window bundle adjustment with per-point Schur complement.

TPU-native replacement for the reference's g2o Levenberg-Marquardt BA
(``/root/reference/src/optimization/g2o_ba.cpp:172-317``): SE3 pose
vertices, marginalized XYZ landmark vertices, UV reprojection edges with a
2x2 information matrix and Huber kernel, BlockSolver<6,3>, 50 LM
iterations, optional fixed landmarks (``is_ba_fix_map_points``), driven by
``callBundleAdjustment_`` (``vo.cpp:384-478``) over the last
``num_prev_frames_to_opti_by_ba`` frames of the 20-frame buffer.

TPU formulation (SURVEY.md §8.1):
- observations are the dense [W, K] grid of (ring keypoint, PtConn link)
  pairs with a validity mask — no graph construction;
- analytic Jacobians; per-point 3x3 Hessian blocks reduced by the Schur
  complement (vmapped batched 3x3 inverses);
- the reduced camera system is a dense [6W, 6W] solve (W<=20);
- Huber robustness via IRLS weights;
- everything is one jit-compiled LM loop (lax.scan) with fixed iteration
  count — poses and points come back as new arrays (the reference wrote
  through raw pointers, g2o_ba.cpp:297-316).

The distributed variant (parallel.dist_ba) shards the point blocks over a
device mesh and psums the reduced camera system — the per-point Schur
reduction is embarrassingly parallel (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_visual_odometry_tpu.models import state as S
from monocular_visual_odometry_tpu.ops import lie
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils.config import VOConfig


class BAProblem(NamedTuple):
    """Fixed-shape windowed BA problem extracted from VO state."""

    T_c_w: jnp.ndarray     # [W,4,4] camera-from-world per window frame
    obs_uv: jnp.ndarray    # [W,K,2] observed pixels
    obs_pid: jnp.ndarray   # [W,K] int32 map-point index (clipped, see mask)
    obs_valid: jnp.ndarray # [W,K] bool
    pts: jnp.ndarray       # [M,3] landmark positions
    pt_used: jnp.ndarray   # [M] bool — observed by some window frame
    frame_valid: jnp.ndarray  # [W] bool


def gather_window(cfg: VOConfig, st: S.VOState,
                  cam: Camera | None = None) -> tuple[BAProblem, jnp.ndarray]:
    """Extract the BA window from the ring buffer
    (callBundleAdjustment_'s frame collection, vo.cpp:395-453).
    Also returns the ring slots [W] for write-back (newest first).

    When ``cam`` is given and ``cfg.ba.obs_gate_px`` > 0, observations
    whose reprojection residual at the CURRENT (tracked) poses exceeds
    the gate — or whose landmark sits behind the camera — are masked out
    before the solve. Tracking hard-gates outlier links via RANSAC-PnP,
    but ring links from older frames can go stale (map point moved by
    culling-era noise, aliased match that once passed); under heavy
    sensor noise those dragged the window and made BA WORSE than no-BA
    (BA_ABLATION_r04.json, noise sigma=20). Same principle as ORB-SLAM's
    chi2 outlier-edge removal between local-BA rounds; the reference's
    g2o BA has no gate (g2o_ba.cpp:255-266), so 0 restores that.

    Two selection modes (cfg.ba.keyframe_window, jit-static):

    - False: the last `window` FRAMES, newest first — the reference's
      num_prev_frames_to_opti_by_ba slice of frames_buff_.
    - True: the current frame + the last `window`-1 KEYFRAME slots. This
      is closer to the reference's link-gated buffered-frame selection
      (vo.cpp:417-453 keeps frames with >=3 map links — in this pipeline
      exactly the keyframes carry dense links) and spans several times
      more baseline per window, which anchors the newest pose against
      older, better-established geometry.
    """
    W = cfg.ba.window
    F = cfg.map.frame_buffer
    if cfg.ba.keyframe_window:
        last = st.frame_idx - 1                       # current frame id
        slot_ids = jnp.arange(F, dtype=jnp.int32)
        # frame id currently occupying each ring slot
        fid = last - jnp.mod(last - slot_ids, F)
        cur_slot = jnp.mod(last, F)
        eligible = (st.ring.occupied & st.ring.is_kf & (fid >= 0)
                    & (slot_ids != cur_slot))
        order = jnp.argsort(jnp.where(eligible, fid, -1))[::-1]  # newest kf first
        kf_slots = order[: W - 1]
        kf_ok = eligible[kf_slots]
        slots = jnp.concatenate([cur_slot[None], kf_slots])
        frame_ids = fid[slots]
        frame_valid = jnp.concatenate(
            [(st.ring.occupied[cur_slot] & (last >= 0))[None], kf_ok])
    else:
        j = jnp.arange(W, dtype=jnp.int32)
        frame_ids = st.frame_idx - 1 - j                 # newest first
        slots = jnp.mod(frame_ids, F)
        frame_valid = (frame_ids >= 0) & st.ring.occupied[slots]

    poses_w_c = st.ring.poses[slots]                 # [W,4,4]
    T_c_w = jax.vmap(lie.inv_T)(poses_w_c)
    obs_uv = st.ring.kpts[slots]                     # [W,K,2]
    pid = st.ring.mp_idx[slots]                      # [W,K]
    valid = (
        frame_valid[:, None]
        & (pid >= 0)
        & st.map.valid[jnp.clip(pid, 0, st.map.valid.shape[0] - 1)]
    )
    pid_safe = jnp.clip(pid, 0, st.map.valid.shape[0] - 1)
    if cam is not None and cfg.ba.obs_gate_px > 0:
        X = st.map.pts[pid_safe]                                 # [W,K,3]
        p = jnp.einsum("wij,wkj->wki", T_c_w[:, :3, :3], X) \
            + T_c_w[:, None, :3, 3]
        z = jnp.maximum(p[..., 2], 1e-6)
        u = p[..., 0] / z * cam.fx + cam.cx
        v = p[..., 1] / z * cam.fy + cam.cy
        err2 = (u - obs_uv[..., 0]) ** 2 + (v - obs_uv[..., 1]) ** 2
        valid = valid & (p[..., 2] > 0) & (
            err2 < cfg.ba.obs_gate_px * cfg.ba.obs_gate_px)
    M = st.map.valid.shape[0]
    pt_used = jnp.zeros(M, bool).at[pid_safe.reshape(-1)].max(valid.reshape(-1))
    return (
        BAProblem(T_c_w=T_c_w, obs_uv=obs_uv, obs_pid=pid_safe,
                  obs_valid=valid, pts=st.map.pts, pt_used=pt_used,
                  frame_valid=frame_valid),
        slots,
    )


def _residuals_and_jacobians(prob: BAProblem, cam: Camera, info: jnp.ndarray):
    """Residuals [W,K,2], pose Jacobians [W,K,2,6], point Jacobians
    [W,K,2,3], all premultiplied by sqrt-information via weighting later.
    Left-multiplicative se(3) perturbation on T_c_w, as in ops.pnp."""
    R = prob.T_c_w[:, :3, :3]                        # [W,3,3]
    t = prob.T_c_w[:, :3, 3]                         # [W,3]
    X = prob.pts[prob.obs_pid]                       # [W,K,3]
    p = jnp.einsum("wij,wkj->wki", R, X) + t[:, None, :]
    z = jnp.maximum(p[..., 2], 1e-6)
    inv_z = 1.0 / z
    u = p[..., 0] * inv_z * cam.fx + cam.cx
    v = p[..., 1] * inv_z * cam.fy + cam.cy
    r = jnp.stack([u - prob.obs_uv[..., 0], v - prob.obs_uv[..., 1]], axis=-1)

    du_dp = jnp.stack(
        [cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * p[..., 0] * inv_z**2], axis=-1)
    dv_dp = jnp.stack(
        [jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * p[..., 1] * inv_z**2], axis=-1)
    J_proj = jnp.stack([du_dp, dv_dp], axis=-2)      # [W,K,2,3]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape + (3,))
    dp_dxi = jnp.concatenate([eye, -lie.hat(p)], axis=-1)   # [W,K,3,6]
    J_pose = J_proj @ dp_dxi                                 # [W,K,2,6]
    J_pt = J_proj @ R[:, None, :, :]                         # [W,K,2,3]
    return r, J_pose, J_pt


def _robust_weights(r: jnp.ndarray, valid: jnp.ndarray, info: jnp.ndarray,
                    huber: float) -> jnp.ndarray:
    """IRLS scalar weight per observation: information-weighted Huber
    (g2o's RobustKernelHuber + 2x2 information, g2o_ba.cpp:255-266)."""
    # info is [2,2]; use its diagonal as per-axis weights, Huber on the
    # weighted norm
    e2 = (r[..., 0] ** 2 * info[0, 0] + r[..., 1] ** 2 * info[1, 1]
          + 2.0 * r[..., 0] * r[..., 1] * info[0, 1])
    e = jnp.sqrt(jnp.maximum(e2, 1e-12))
    w = jnp.where(e <= huber, 1.0, huber / e)
    return jnp.where(valid, w, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ba_solve(cfg: VOConfig, cam: Camera, prob: BAProblem):
    """Run the windowed LM and return (new T_c_w [W,4,4], new pts [M,3]).

    When cfg.ba.fix_map_points (the reference default), the Schur step is
    skipped and the camera system is block-diagonal. Otherwise landmark
    blocks are eliminated per point and recovered by back-substitution.
    The joint mode converges on well-posed problems (see tests/test_ba.py;
    the reference documents outright divergence, README.md:268), but in
    the streaming pipeline per-frame joint optimization of a 5-frame
    window still degrades long-run map consistency (points shared with
    out-of-window frames get dragged to fit recent noise) — so, like the
    reference, the pipeline default keeps landmarks fixed.

    When ``cfg.ba.regate_px`` > 0 the LM runs in TWO rounds with a chi2
    re-gate in between: after the first half of the iterations,
    observations whose residual at the CURRENT iterate exceeds the gate
    (or whose landmark went behind a camera) are masked out, and the
    second half runs on the survivors. This is ORB-SLAM's two-stage local
    BA (optimize -> drop chi2 outlier edges -> re-optimize); the g2o
    reference has no equivalent (g2o_ba.cpp:245-271 keeps every edge,
    robust kernel only). The gather-time gate (gather_window) tests
    against the PRE-solve poses and cannot catch links that only become
    outliers once the window moves — the measured failure mode on the
    adversarial family (BA_ABLATION_r04.json: end drift doubled).
    """
    W = cfg.ba.window
    M = prob.pts.shape[0]
    # deterministic mode: run every reduction in f64 (see BAConfig.
    # deterministic). Requires x64 enabled in the process; without it the
    # casts are no-ops and this IS the default f32 path.
    dtype = jnp.float64 if cfg.ba.deterministic else jnp.float32
    prob = jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, prob)
    info = jnp.asarray(cfg.ba.information_matrix, dtype=dtype).reshape(2, 2)
    huber = cfg.ba.huber_delta
    fix_points = cfg.ba.fix_map_points

    regate = cfg.ba.regate_px > 0 and cfg.ba.iterations >= 2
    n1 = cfg.ba.iterations // 2          # re-gate fires entering iteration n1

    def cost_fn(T_c_w, pts, valid):
        p2 = prob._replace(T_c_w=T_c_w, pts=pts)
        r, _, _ = _residuals_and_jacobians(p2, cam, info)
        w = _robust_weights(r, valid, info, huber)
        e2 = (r[..., 0] ** 2 * info[0, 0] + r[..., 1] ** 2 * info[1, 1]
              + 2.0 * r[..., 0] * r[..., 1] * info[0, 1])
        return jnp.sum(w * e2)

    def lm_step(carry, i):
        # cost_old is CARRIED (the accepted cost from the previous
        # iteration — bit-identical to recomputing it, the LM state only
        # changes on accept): one full residual pass per iteration saved,
        # which matters because the 12-iteration chain is op-launch
        # latency-bound on TPU, not FLOP-bound (MFU ~5e-6).
        T_c_w, pts, lam, cost_old, valid, pt_used = carry
        p2 = prob._replace(T_c_w=T_c_w, pts=pts)
        r, J_c, J_p = _residuals_and_jacobians(p2, cam, info)
        if regate:
            # chi2 re-gate at iteration n1 (see docstring), formulated as
            # SELECTS on the carried mask rather than a lax.cond branch:
            # the gate is computed every iteration from the J-pass
            # residuals already in hand (nearly free) and written into the
            # carry only when i == n1. A cond-in-scan variant compiled
            # 10x+ slower on the TPU backend; two unrolled scans were
            # worse still.
            err2 = r[..., 0] ** 2 + r[..., 1] ** 2
            Rm = T_c_w[:, :3, :3]
            z = (jnp.einsum("wij,wkj->wki", Rm, pts[prob.obs_pid])
                 + T_c_w[:, None, :3, 3])[..., 2]
            gate2 = jnp.asarray(cfg.ba.regate_px * cfg.ba.regate_px, dtype)
            if cfg.ba.regate_sigma_mult > 0:
                # noise-calibrated gate: mult * median residual at the
                # current iterate (see BAConfig.regate_sigma_mult)
                flat = jnp.sort(jnp.where(valid, err2, jnp.inf).reshape(-1))
                nv = jnp.sum(valid)
                med2 = flat[jnp.maximum((nv - 1) // 2, 0)]
                med2 = jnp.where(jnp.isfinite(med2), med2, 0.0)
                gate2 = jnp.maximum(
                    gate2, cfg.ba.regate_sigma_mult ** 2 * med2)
            keep = valid & (z > 0) & (err2 < gate2)
            # never gate a frame below the reference's min-links rule (>=3
            # links per BA frame, vo.cpp:421-427): if the re-gate would
            # leave a frame under-constrained, keep its original mask
            enough = jnp.sum(keep, axis=1) >= 3
            keep = jnp.where(enough[:, None], keep, valid)
            fire = i == n1
            valid = jnp.where(fire, keep, valid)
            if not fix_points:
                pt_used_new = jnp.zeros(M, bool).at[
                    prob.obs_pid.reshape(-1)].max(valid.reshape(-1))
                pt_used = jnp.where(fire, pt_used_new, pt_used)
            # the accepted cost must be re-based on the NEW mask at the
            # current state — computable from the same residuals
            w_k = _robust_weights(r, valid, info, huber)
            e2k = (r[..., 0] ** 2 * info[0, 0] + r[..., 1] ** 2 * info[1, 1]
                   + 2.0 * r[..., 0] * r[..., 1] * info[0, 1])
            cost_old = jnp.where(fire, jnp.sum(w_k * e2k), cost_old)
        n_obs = jnp.maximum(jnp.sum(valid), 1)
        w = _robust_weights(r, valid, info, huber)

        # per-observation weighted blocks; info folded into the 2-axis
        Wr2 = jnp.einsum("ab,wkb->wka", info, r) * w[..., None]   # [W,K,2]
        JcW = jnp.einsum("wkai,ab->wkbi", J_c, info) * w[..., None, None]
        JpW = jnp.einsum("wkai,ab->wkbi", J_p, info) * w[..., None, None]

        H_cc = jnp.einsum("wkai,wkaj->wij", JcW, J_c)             # [W,6,6]
        g_c = jnp.einsum("wkai,wka->wi", J_c, Wr2)                # [W,6]

        # frames that must not move: out-of-window slots, and (joint
        # mode) the two oldest valid frames as the similarity-gauge
        # anchor (the unfixed gauge is the likely root of the
        # divergence the reference documents for joint optimization,
        # doc/log.md:4-13).
        fixed = ~prob.frame_valid
        if not fix_points:
            W_ = prob.frame_valid.shape[0]
            order = jnp.arange(W_ - 1, -1, -1)
            rev_valid = prob.frame_valid[order]
            oldest = W_ - 1 - jnp.argmax(rev_valid)
            second = W_ - 1 - jnp.argmax(
                rev_valid.at[W_ - 1 - oldest].set(False))
            fixed = fixed | (jnp.arange(W_) == oldest) | (
                jnp.arange(W_) == second)
        # freeze inside the linear system (huge stiffness), not post-hoc
        # — post-solve zeroing leaves the coupled point updates
        # inconsistent
        H_cc = H_cc + jnp.where(fixed, 1e8, 0.0)[:, None, None] * jnp.eye(
            6, dtype=r.dtype)[None]
        g_c = jnp.where(fixed[:, None], 0.0, g_c)

        if fix_points:
            Hd = H_cc + lam * jnp.broadcast_to(
                jnp.eye(6, dtype=r.dtype), H_cc.shape)
            delta_c = -jnp.linalg.solve(Hd, g_c[..., None])[..., 0]
            delta_p = jnp.zeros_like(pts)
        else:
            # scatter per-point blocks over the landmark pool
            flat_pid = prob.obs_pid.reshape(-1)
            Hpp_obs = jnp.einsum(
                "wkai,wkaj->wkij", JpW, J_p).reshape(-1, 3, 3)
            gp_obs = jnp.einsum("wkai,wka->wki", J_p, Wr2).reshape(-1, 3)
            A = jnp.zeros((M, 3, 3), r.dtype).at[flat_pid].add(Hpp_obs)
            b_p = jnp.zeros((M, 3), r.dtype).at[flat_pid].add(gp_obs)
            # Damping with a relative Tikhonov floor: a landmark seen
            # from ~2 nearby cameras has a near-null depth direction;
            # flooring the minimum eigenvalue at 1e-2*dmax bounds each
            # block's condition number to O(3e2) (max eigenvalue <=
            # trace ~ 3*dmax), so f32 summation-order noise (~1e-7
            # relative on the Gram sums) passes through A^-1 attenuated
            # to <=1e-4-level update disagreement between compilations
            # — this is what lets test_dist_ba gate dist-vs-single
            # agreement at 1e-2 instead of the 0.37 worst case observed
            # at a 1e-4 floor. The extra damping only slows the
            # near-null (barely observable) depth directions;
            # convergence tests are unaffected.
            dmax = jnp.maximum(
                A[:, jnp.arange(3), jnp.arange(3)].max(-1), 1e-12)
            A = A + (lam + 1e-2 * dmax)[:, None, None] * jnp.eye(
                3, dtype=r.dtype)[None]
            A = jnp.where(pt_used[:, None, None], A,
                          jnp.broadcast_to(
                              jnp.eye(3, dtype=r.dtype), A.shape))
            A_inv = jnp.linalg.inv(A)                              # [M,3,3]

            # camera-point coupling U[w,p] = sum_k Jc^T W Jp
            U_obs = jnp.einsum("wkai,wkaj->wkij", JcW, J_p)        # [W,K,6,3]
            U = jnp.zeros((W, M, 6, 3), r.dtype)
            wk_idx = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[:, None],
                prob.obs_pid.shape)
            U = U.at[wk_idx.reshape(-1), flat_pid].add(
                U_obs.reshape(-1, 6, 3))

            # reduced camera system S = H_cc - U A^-1 U^T (coupled blocks)
            UAinv = jnp.einsum("wpij,pjk->wpik", U, A_inv)         # [W,M,6,3]
            S_off = jnp.einsum("wpik,vplk->wvil", UAinv, U)        # [W,W,6,6]
            S = -S_off
            diag = jnp.arange(W)
            S = S.at[diag, diag].add(
                H_cc + lam * jnp.eye(6, dtype=r.dtype)[None])
            g_red = g_c - jnp.einsum("wpik,pk->wi", UAinv, b_p)    # [W,6]

            S_full = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
            delta_c = -jnp.linalg.solve(
                S_full, g_red.reshape(-1)).reshape(W, 6)
            # Zero the gauge-fixed frames BEFORE back-substitution: the
            # 1e8 stiffness leaks delta_c[fixed] ~ |g_corr|/1e8
            # (measured 4e-4, NOT negligible), and the landmark update
            # must be consistent with the camera update actually
            # applied. Back-substituting with the unzeroed delta_c was
            # the round-3 "10.5% multihost cost gap": the dist solver
            # zeroed first (correctly), this one didn't, and the two LMs
            # genuinely solved different updates — at any precision.
            # Root-caused in round 4 via f64 iterate comparison; see
            # tests/test_dist_ba.py::test_single_vs_dist.
            delta_c = jnp.where(fixed[:, None], 0.0, delta_c)
            # back-substitute landmarks
            rhs = b_p + jnp.einsum("wpij,wi->pj", U, delta_c)
            delta_p = -jnp.einsum("pij,pj->pi", A_inv, rhs)
            delta_p = jnp.where(pt_used[:, None], delta_p, 0.0)

        delta_c = jnp.where(fixed[:, None], 0.0, delta_c)
        T_new = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(delta_c, T_c_w)
        pts_new = pts + delta_p

        cost_new = cost_fn(T_new, pts_new, valid)
        accept = cost_new < cost_old
        T_c_w = jnp.where(accept, T_new, T_c_w)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        # report the ACCEPTED state's cost (rejected proposals keep the
        # old cost) so the costs trace is monotone within each round and
        # usable in assertions
        cost_acc = jnp.where(accept, cost_new, cost_old)
        return (T_c_w, pts, lam, cost_acc, valid, pt_used), cost_acc / n_obs

    # true-f32 contractions: the MXU's default one-pass-bf16 f32 matmul
    # corrupts the normal equations (see the note in models.vo.step_fused)
    with jax.default_matmul_precision("highest"):
        cost0 = cost_fn(prob.T_c_w, prob.pts, prob.obs_valid)
        (T, pts, _, _, _, _), costs = jax.lax.scan(
            lm_step,
            (prob.T_c_w, prob.pts, jnp.asarray(cfg.ba.init_lambda, dtype),
             cost0, prob.obs_valid, prob.pt_used),
            jnp.arange(cfg.ba.iterations), length=cfg.ba.iterations,
        )
    return (T.astype(jnp.float32), pts.astype(jnp.float32),
            costs.astype(jnp.float32))


def write_back(cfg: VOConfig, st: S.VOState, prob: BAProblem,
               slots: jnp.ndarray, T_c_w: jnp.ndarray,
               pts: jnp.ndarray) -> S.VOState:
    """Functional write-back of a solved window: poses into the ring (+
    current + reference keyframe if it still lives in the ring) and
    landmark positions into the map. Shared by the single-device and
    distributed solvers — the TPU-native replacement for the reference's
    raw-pointer mutation (g2o_ba.cpp:297-316).

    Trust region (cfg.ba.max_pose_correction): if the solve moved the
    CURRENT frame's pose further than this from its tracked value, the
    whole window update is rejected (state returned unchanged). The
    windowed LM refines a pose RANSAC-PnP already placed within noise; a
    correction at keyframe-spacing scale means stale/aliased ring links
    dragged the window (the adversarial-family failure,
    BA_ABLATION_r04.json) — same principle as tracking's own pose-jump
    reject (vo.cpp:363-369), applied to the optimizer's output."""
    poses_w_c = jax.vmap(lie.inv_T)(T_c_w)                      # [W,4,4]

    ring_poses = st.ring.poses.at[slots].set(
        jnp.where(prob.frame_valid[:, None, None], poses_w_c, st.ring.poses[slots]))
    new_map = st.map._replace(
        pts=jnp.where((prob.pt_used & st.map.valid)[:, None], pts, st.map.pts))

    T_curr = jnp.where(prob.frame_valid[0], poses_w_c[0], st.T_w_c)

    # re-sync the reference keyframe pose if it still lives in the ring
    F = cfg.map.frame_buffer
    ref_age = st.frame_idx - st.ref_frame_idx
    ref_fresh = (ref_age >= 1) & (ref_age <= F)
    ref_slot = jnp.mod(st.ref_frame_idx, F)
    ref_pose = jnp.where(ref_fresh, ring_poses[ref_slot], st.ref_pose)

    new_st = st._replace(
        T_w_c=T_curr,
        ring=st.ring._replace(poses=ring_poses),
        map=new_map,
        ref_pose=ref_pose,
        last_keyframe_pose=jnp.where(ref_fresh, ref_pose, st.last_keyframe_pose),
    )
    if cfg.ba.max_pose_correction > 0:
        ok = lie.pose_distance(T_curr, st.T_w_c) <= cfg.ba.max_pose_correction
        new_st = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(ok, (1,) * a.ndim) if a.ndim else ok, a, b),
            new_st, st)
        # count rejections so a trust gate that fires persistently is
        # visible (StepOutput.ba_rejected_total; no-silent-caps practice)
        new_st = new_st._replace(
            ba_rejected=st.ba_rejected + (~ok).astype(jnp.int32))
    return new_st


@functools.partial(jax.jit, static_argnames=("cfg",))
def ba_update_state(cfg: VOConfig, cam: Camera, st: S.VOState) -> S.VOState:
    """Full BA step on the VO state: gather window, solve, write back poses
    (ring + current + reference if fresh) and landmarks functionally."""
    prob, slots = gather_window(cfg, st, cam)
    T_c_w, pts, _ = ba_solve(cfg, cam, prob)
    return write_back(cfg, st, prob, slots, T_c_w, pts)
