"""Windowed BA tests: synthetic problems with exact ground truth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from monocular_visual_odometry_tpu.models import ba as BA
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.utils.config import VOConfig


def _make_problem(W=5, K=64, M=256, noise_px=0.5, pose_noise=0.02,
                  pt_noise=0.0, seed=0):
    """Build a BAProblem with known GT: W cameras observing M points."""
    rng = np.random.default_rng(seed)
    cam = Camera.create(615, 615, 320, 240)
    pts_gt = np.stack([rng.uniform(-3, 3, M), rng.uniform(-2, 2, M),
                       rng.uniform(4, 9, M)], axis=1)
    T_w_c_gt = []
    for w in range(W):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("yxz", rng.uniform(-0.05, 0.05, 3)).as_matrix()
        T[:3, 3] = [0.1 * w, 0.02 * w, 0.05 * w]
        T_w_c_gt.append(T)
    T_w_c_gt = np.stack(T_w_c_gt)
    T_c_w_gt = np.linalg.inv(T_w_c_gt)

    obs_uv = np.zeros((W, K, 2), np.float32)
    obs_pid = np.zeros((W, K), np.int32)
    obs_valid = np.zeros((W, K), bool)
    for w in range(W):
        pid = rng.choice(M, K, replace=False)
        p_c = pts_gt @ T_c_w_gt[w][:3, :3].T + T_c_w_gt[w][:3, 3]
        uv = p_c[:, :2] / p_c[:, 2:3] * 615 + [320, 240]
        sel = pid
        obs_uv[w] = uv[sel] + rng.normal(0, noise_px, (K, 2))
        obs_pid[w] = sel
        obs_valid[w] = (p_c[sel, 2] > 0.5)

    # perturb initial values
    T_c_w_init = []
    for w in range(W):
        xi = np.concatenate([rng.normal(0, pose_noise, 3), rng.normal(0, pose_noise / 2, 3)])
        from monocular_visual_odometry_tpu.ops import lie
        P = np.asarray(lie.se3_exp(jnp.asarray(xi, dtype=jnp.float32))) @ T_c_w_gt[w]
        T_c_w_init.append(P)
    pts_init = pts_gt + rng.normal(0, pt_noise, pts_gt.shape)

    pt_used = np.zeros(M, bool)
    pt_used[np.unique(obs_pid)] = True
    prob = BA.BAProblem(
        T_c_w=jnp.asarray(np.stack(T_c_w_init), dtype=jnp.float32),
        obs_uv=jnp.asarray(obs_uv),
        obs_pid=jnp.asarray(obs_pid),
        obs_valid=jnp.asarray(obs_valid),
        pts=jnp.asarray(pts_init, dtype=jnp.float32),
        pt_used=jnp.asarray(pt_used),
        frame_valid=jnp.ones(W, bool),
    )
    return prob, cam, T_c_w_gt, pts_gt


def _pose_errs(T_est, T_gt):
    errs = []
    for a, b in zip(np.asarray(T_est), T_gt):
        d = a @ np.linalg.inv(b)
        errs.append(np.linalg.norm(d[:3, 3]))
    return np.array(errs)


def _cfg(fix_points=True, window=5, iters=20):
    cfg = VOConfig()
    return cfg.replace(ba=dataclasses.replace(
        cfg.ba, fix_map_points=fix_points, window=window, iterations=iters))


def test_pose_only_ba_converges():
    prob, cam, T_gt, pts_gt = _make_problem(noise_px=0.0, pose_noise=0.03)
    cfg = _cfg(fix_points=True)
    T_opt, pts, costs = BA.ba_solve(cfg, cam, prob)
    before = _pose_errs(prob.T_c_w, T_gt)
    after = _pose_errs(T_opt, T_gt)
    assert after.max() < 1e-3, (before, after)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(prob.pts), atol=0)


def test_pose_only_ba_with_noise():
    prob, cam, T_gt, pts_gt = _make_problem(noise_px=0.5, pose_noise=0.03)
    cfg = _cfg(fix_points=True)
    T_opt, _, costs = BA.ba_solve(cfg, cam, prob)
    after = _pose_errs(T_opt, T_gt)
    assert after.max() < 0.01, after
    # cost decreases
    c = np.asarray(costs)
    assert c[-1] <= c[0]


def test_joint_ba_schur_converges():
    """Full BA with landmarks free (the mode the reference couldn't make
    converge, README.md:268). The two oldest frames are the gauge anchor,
    so they start unperturbed (as in a VO window anchored on the past)."""
    prob, cam, T_gt, pts_gt = _make_problem(
        noise_px=0.0, pose_noise=0.02, pt_noise=0.05)
    T_init = np.asarray(prob.T_c_w).copy()
    T_init[3:] = T_gt[3:]   # anchor frames (oldest two) start exact
    prob = prob._replace(T_c_w=jnp.asarray(T_init))
    cfg = _cfg(fix_points=False, iters=30)
    T_opt, pts_opt, costs = BA.ba_solve(cfg, cam, prob)
    after = _pose_errs(T_opt, T_gt)
    assert after.max() < 5e-3, after
    used = np.asarray(prob.pt_used)
    pt_err = np.linalg.norm(np.asarray(pts_opt)[used] - pts_gt[used], axis=1)
    pt_err_before = np.linalg.norm(np.asarray(prob.pts)[used] - pts_gt[used], axis=1)
    # gauge freedom allows global drift; compare median improvement
    assert np.median(pt_err) < np.median(pt_err_before) * 0.3


def test_joint_ba_with_noise_reduces_cost():
    prob, cam, T_gt, pts_gt = _make_problem(
        noise_px=1.0, pose_noise=0.02, pt_noise=0.03, seed=3)
    # the 1e-2 conditioning floor (models/ba.py) slows the weakly-observed
    # depth directions, so reaching the noise floor takes more iterations
    # than the 25 that sufficed at the older 1e-4 floor
    cfg = _cfg(fix_points=False, iters=60)
    _, _, costs = BA.ba_solve(cfg, cam, prob)
    c = np.asarray(costs)
    assert np.isfinite(c[-1])
    # The pre-step cost of this problem is >>10 (0.02-rad pose noise at
    # fx=615); the optimizer must land at the 1px-noise floor: ~2 px^2/obs
    # of irreducible measurement noise plus residual geometry error, ~2.96
    # observed. Absolute bound, not a ratio of c[0] — c[0] is the cost
    # after the FIRST LM step, whose accept/reject outcome is not a stable
    # normalizer.
    # 3.3 rather than the ~2.96 raw noise floor: the 1e-2 conditioning
    # floor holds the weakly-observed depth directions slightly off their
    # unregularized optimum (~8% cost) in exchange for deterministic
    # dist-vs-single agreement (test_dist_ba); pose/point accuracy is
    # unaffected (test_joint_ba_schur_converges).
    assert c[-1] < 3.3, c
    # and the LM trajectory must actually descend
    assert c[-1] <= c[0], c


def test_invalid_frames_untouched():
    prob, cam, T_gt, pts_gt = _make_problem()
    fv = jnp.asarray([True, True, True, False, False])
    prob = prob._replace(
        frame_valid=fv,
        obs_valid=prob.obs_valid & fv[:, None])
    cfg = _cfg(fix_points=True)
    T_opt, _, _ = BA.ba_solve(cfg, cam, prob)
    np.testing.assert_allclose(np.asarray(T_opt)[3:], np.asarray(prob.T_c_w)[3:],
                               atol=0)


def test_huber_downweights_outlier_observations():
    prob, cam, T_gt, pts_gt = _make_problem(noise_px=0.3, pose_noise=0.02, seed=5)
    # corrupt 10% of observations grossly
    uv = np.asarray(prob.obs_uv).copy()
    rng = np.random.default_rng(0)
    for w in range(uv.shape[0]):
        bad = rng.choice(uv.shape[1], uv.shape[1] // 10, replace=False)
        uv[w, bad] += rng.uniform(30, 80, (len(bad), 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    cfg = _cfg(fix_points=True)
    T_opt, _, _ = BA.ba_solve(cfg, cam, prob)
    after = _pose_errs(T_opt, T_gt)
    assert after.max() < 0.02, after


def test_obs_gate_masks_stale_links():
    """BAConfig.obs_gate_px (round 4): window observations whose
    reprojection residual at the tracked pose exceeds the gate — or whose
    landmark is behind the camera — are masked at gather time; in-gate
    observations and the ungated (obs_gate_px=0 / cam=None) path are
    untouched. Regression for the noise-20 'BA worse than no-BA' finding
    (BA_ABLATION_r04.json)."""
    import dataclasses

    from monocular_visual_odometry_tpu.models import state as S
    from monocular_visual_odometry_tpu.ops.camera import Camera

    cfg = VOConfig()
    cfg = cfg.replace(ba=dataclasses.replace(
        cfg.ba, keyframe_window=False, window=1, obs_gate_px=9.0))
    cam = Camera.create(615.0, 615.0, 320.0, 240.0)
    st = S.init_state(cfg)

    pts = np.asarray(st.map.pts).copy()
    valid = np.asarray(st.map.valid).copy()
    pts[0] = [0.0, 0.0, 4.0]    # projects to (320, 240) under identity
    pts[1] = [1.0, 0.0, 4.0]    # projects to (473.75, 240) — far
    pts[2] = [0.0, 0.0, -4.0]   # behind the camera
    valid[:3] = True
    st = st._replace(map=st.map._replace(pts=jnp.asarray(pts),
                                         valid=jnp.asarray(valid)))

    kpts = np.asarray(st.ring.kpts[0]).copy()
    links = np.full(kpts.shape[0], -1, np.int32)
    kpts[0] = [320.0, 240.0]; links[0] = 0    # residual 0      -> kept
    kpts[1] = [320.0, 240.0]; links[1] = 1    # residual ~154px -> gated
    kpts[2] = [327.0, 240.0]; links[2] = 0    # residual 7px    -> kept
    kpts[3] = [320.0, 240.0]; links[3] = 2    # behind camera   -> gated
    ring = st.ring.push(0, jnp.eye(4), jnp.asarray(kpts),
                        jnp.asarray(links), is_kf=True)
    st = st._replace(ring=ring, frame_idx=jnp.asarray(1, jnp.int32))

    prob, _ = BA.gather_window(cfg, st, cam)
    ov = np.asarray(prob.obs_valid)[0]
    assert ov[0] and ov[2], "in-gate observations must survive"
    assert not ov[1], "154px stale link must be gated"
    assert not ov[3], "behind-camera landmark must be gated"

    # ungated paths: cam=None, or obs_gate_px=0 with cam given
    for prob_u in (BA.gather_window(cfg, st)[0],
                   BA.gather_window(cfg.replace(ba=dataclasses.replace(
                       cfg.ba, keyframe_window=False, window=1,
                       obs_gate_px=0.0)), st, cam)[0]):
        ou = np.asarray(prob_u.obs_valid)[0]
        assert ou[0] and ou[1] and ou[2] and ou[3], \
            "ungated gather must keep every linked observation"


class TestKeyframeWindowGather:
    """gather_window in keyframe-window mode (cfg.ba.keyframe_window):
    slot selection must pick the current frame + the newest keyframes,
    never duplicate a slot, and mask missing keyframes."""

    def _state(self, cfg, frame_idx, kf_frames):
        from monocular_visual_odometry_tpu.models import state as S

        st = S.init_state(cfg)
        F = cfg.map.frame_buffer
        ring = st.ring
        for i in range(frame_idx):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = float(i)   # recognizable per-frame pose
            ring = ring.push(i % F, jnp.asarray(pose),
                             st.ring.kpts[0], st.ring.mp_idx[0],
                             is_kf=(i in kf_frames))
        return st._replace(ring=ring,
                           frame_idx=jnp.asarray(frame_idx, jnp.int32))

    def _gathered_x(self, prob):
        """x-translation of each window pose (frame id by construction).
        T_c_w = inv(T_w_c) so x is negated."""
        return -np.asarray(prob.T_c_w)[:, 0, 3]

    def test_picks_current_plus_newest_keyframes(self):
        import dataclasses

        cfg = VOConfig()
        cfg = cfg.replace(ba=dataclasses.replace(cfg.ba, keyframe_window=True,
                                                 window=4))
        # frames 0..9; keyframes at 0, 3, 6, 8 (current frame is 9)
        st = self._state(cfg, frame_idx=10, kf_frames={0, 3, 6, 8})
        prob, slots = BA.gather_window(cfg, st)
        ids = self._gathered_x(prob)
        assert np.asarray(prob.frame_valid).all()
        # slot 0 = current frame 9; then keyframes newest-first 8, 6, 3
        assert list(ids.astype(int)) == [9, 8, 6, 3]
        assert len(set(np.asarray(slots).tolist())) == len(np.asarray(slots))

    def test_current_frame_is_keyframe_not_duplicated(self):
        import dataclasses

        cfg = VOConfig()
        cfg = cfg.replace(ba=dataclasses.replace(cfg.ba, keyframe_window=True,
                                                 window=3))
        # current frame 5 is itself a keyframe
        st = self._state(cfg, frame_idx=6, kf_frames={2, 4, 5})
        prob, slots = BA.gather_window(cfg, st)
        ids = self._gathered_x(prob)
        assert list(ids.astype(int)) == [5, 4, 2]
        assert len(set(np.asarray(slots).tolist())) == len(np.asarray(slots))

    def test_too_few_keyframes_masks_slots(self):
        import dataclasses

        cfg = VOConfig()
        cfg = cfg.replace(ba=dataclasses.replace(cfg.ba, keyframe_window=True,
                                                 window=5))
        st = self._state(cfg, frame_idx=3, kf_frames={0})
        prob, slots = BA.gather_window(cfg, st)
        valid = np.asarray(prob.frame_valid)
        assert valid[0]            # current frame
        assert valid[1]            # the one keyframe
        assert not valid[2:].any() # no other keyframes exist
        ids = self._gathered_x(prob)
        assert int(ids[0]) == 2 and int(ids[1]) == 0


def test_regate_drops_moving_outliers():
    """Iterative chi2 re-gate (cfg.ba.regate_px, VERDICT r4 next #1):
    observations that only reveal themselves as outliers once the window
    moves toward the solution must be dropped between LM rounds. We build
    a problem whose outlier observations are CONSISTENT with the perturbed
    initial poses (so a gather-time gate at the initial iterate would keep
    them) but wrong for the true geometry."""
    prob, cam, T_gt, pts_gt = _make_problem(
        noise_px=0.3, pose_noise=0.02, seed=3)
    # corrupt 20% of frame-0..4 observations with a 6-px bias — inside any
    # sane gather gate, outside the 3-px re-gate once the solve converges
    rng = np.random.default_rng(7)
    uv = np.asarray(prob.obs_uv).copy()
    W, K, _ = uv.shape
    n_bad = K // 5
    for w in range(W):
        bad = rng.choice(K, n_bad, replace=False)
        uv[w, bad] += rng.normal(0, 6.0, (n_bad, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))

    cfg_no = _cfg(fix_points=True, iters=20).replace(
        ba=dataclasses.replace(_cfg().ba, iterations=20, regate_px=0.0))
    cfg_re = _cfg(fix_points=True, iters=20).replace(
        ba=dataclasses.replace(_cfg().ba, iterations=20, regate_px=3.0))
    T_no, _, _ = BA.ba_solve(cfg_no, cam, prob)
    T_re, _, _ = BA.ba_solve(cfg_re, cam, prob)
    err_no = _pose_errs(T_no, T_gt).max()
    err_re = _pose_errs(T_re, T_gt).max()
    # the re-gated solve must be strictly more accurate (the biased 20%
    # drag the Huber-only solve) and land near GT
    assert err_re < err_no, (err_re, err_no)
    assert err_re < 5e-3, err_re


def test_regate_keeps_min_links_per_frame():
    """A frame whose pose is badly off must NOT be gated below the
    reference's >=3-links rule (vo.cpp:421-427): if the re-gate would
    leave fewer than 3 observations, the original mask is kept."""
    prob, cam, T_gt, pts_gt = _make_problem(noise_px=0.0, pose_noise=0.0)
    # yank frame 2 far off so EVERY residual at the first-round iterate
    # exceeds the gate
    from monocular_visual_odometry_tpu.ops import lie
    T = np.asarray(prob.T_c_w).copy()
    T[2] = np.asarray(
        lie.se3_exp(jnp.asarray([0.5, 0.4, 0.0, 0.0, 0.0, 0.0]))) @ T[2]
    prob = prob._replace(T_c_w=jnp.asarray(T))
    # the re-gate must be ON for this test (shipped default is off)
    cfg = _cfg(fix_points=True, iters=20).replace(
        ba=dataclasses.replace(_cfg(iters=20).ba, regate_px=3.0))
    assert cfg.ba.regate_px > 0
    T_opt, _, costs = BA.ba_solve(cfg, cam, prob)
    # with the min-links fallback the frame keeps its observations and the
    # LM pulls it back to GT
    err = _pose_errs(T_opt, T_gt)
    assert err[2] < 1e-2, err


def test_trust_region_rejects_dragged_window():
    """write_back trust region (cfg.ba.max_pose_correction): a solve that
    moves the current pose beyond the gate must leave the state unchanged;
    a small correction must be applied."""
    from monocular_visual_odometry_tpu.models import state as S
    from monocular_visual_odometry_tpu.ops import lie

    cfg = VOConfig()
    st = S.init_state(cfg)
    st = st._replace(frame_idx=jnp.asarray(3, jnp.int32),
                     T_w_c=jnp.eye(4, dtype=jnp.float32))
    prob, slots = BA.gather_window(cfg, st)
    W = cfg.ba.window
    # fabricate a "solved" window whose current pose moved 0.2 (>> 0.03)
    T_big = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    T_big[0, 0, 3] = 0.2
    big = BA.write_back(cfg, st, prob._replace(frame_valid=jnp.ones(W, bool)),
                        slots, jnp.asarray(T_big), st.map.pts)
    np.testing.assert_allclose(np.asarray(big.T_w_c), np.asarray(st.T_w_c))
    # the rejection is counted (StepOutput.ba_rejected_total observability)
    assert int(big.ba_rejected) == int(st.ba_rejected) + 1
    # a small correction (0.01) is applied
    T_small = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    T_small[0, 0, 3] = 0.01
    small = BA.write_back(cfg, st,
                          prob._replace(frame_valid=jnp.ones(W, bool)),
                          slots, jnp.asarray(T_small), st.map.pts)
    # write_back returns inv(T_c_w) as the new pose
    assert abs(float(small.T_w_c[0, 3]) - (-0.01)) < 1e-6
    assert int(small.ba_rejected) == int(st.ba_rejected)  # accepted: no count
