"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device Schur solver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_visual_odometry_tpu.models import ba as BA
from monocular_visual_odometry_tpu.parallel import dist_ba, mesh as M
from monocular_visual_odometry_tpu.utils.config import VOConfig

from test_ba import _make_problem, _pose_errs


def _cfg(iters=15):
    cfg = VOConfig()
    return cfg.replace(ba=dataclasses.replace(
        cfg.ba, fix_map_points=False, window=5, iterations=iters))


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dist_matches_single_device_one_iteration_20_seeds():
    """One LM iteration: the sharded Schur reduction must reproduce the
    single-device solver to the f32 noise floor, across 20 seeds.

    The agreement bound is set by the solvers' relative Tikhonov floor
    (1e-2 * dmax, models/ba.py): it caps each point block's condition
    number at ~3e2, so f32 summation-order differences between the two
    compilations (~1e-7 relative on the Gram sums) can disturb a point
    update by at most ~1e-4 of dmax — observed worst case 0.012 absolute
    on unit-scale scenes over seeds 0..19 (at the earlier 1e-4 floor the
    worst case was 0.37)."""
    cfg = _cfg(iters=1)
    solve = None
    worst, p75, pose_worst = 0.0, 0.0, 0.0
    for seed in range(20):
        prob, cam, T_gt, pts_gt = _make_problem(
            M=256, noise_px=0.3, pose_noise=0.02, pt_noise=0.03, seed=seed)
        if solve is None:
            solve = dist_ba.make_dist_ba(cfg, cam, M.points_mesh())
        T_ref, pts_ref, c_ref = BA.ba_solve(cfg, cam, prob)
        T_dist, pts_dist, c_dist = solve(prob)
        pose_worst = max(pose_worst, float(
            np.abs(np.asarray(T_dist) - np.asarray(T_ref)).max()))
        used = np.asarray(prob.pt_used)
        d = np.abs(np.asarray(pts_dist)[used] - np.asarray(pts_ref)[used]).max(1)
        worst = max(worst, float(d.max()))
        p75 = max(p75, float(np.percentile(d, 75)))
    assert pose_worst < 1e-4, pose_worst
    assert p75 < 0.01, p75
    assert worst < 0.02, worst
    # (no cost gate here: the reported per-iteration cost depends on the
    # accept/reject decision, which can flip on f32 ties between the two
    # compilations even when the accepted states agree to 1e-4)


def test_dist_reaches_single_device_cost():
    """Across 15 iterations both optimizers must land at the same
    normalized cost to f32 summation-order noise. (Round 4 tightened this
    gate 0.05 -> 1e-3: the old slack was absorbing a real single-device
    bug — back-substitution with the unzeroed gauge-fixed delta_c — that
    made the solvers genuinely solve different landmark updates. Fixed in
    models/ba.py; measured agreement is now ~1e-6.)"""
    prob, cam, T_gt, pts_gt = _make_problem(M=256, noise_px=0.3, pose_noise=0.02,
                                            pt_noise=0.03)
    cfg = _cfg(iters=15)
    _, _, c_ref = BA.ba_solve(cfg, cam, prob)
    solve = dist_ba.make_dist_ba(cfg, cam, M.points_mesh())
    _, _, c_dist = solve(prob)
    ref = float(np.asarray(c_ref)[-1])
    dist = float(np.asarray(c_dist)[-1])
    assert abs(ref - dist) < 1e-3 * ref, (ref, dist)


def test_dist_converges_to_gt():
    prob, cam, T_gt, pts_gt = _make_problem(M=512, noise_px=0.0,
                                            pose_noise=0.02, pt_noise=0.05)
    T_init = np.asarray(prob.T_c_w).copy()
    T_init[3:] = T_gt[3:]
    prob = prob._replace(T_c_w=jnp.asarray(T_init))
    cfg = _cfg(iters=30)
    mesh = M.points_mesh()
    solve = dist_ba.make_dist_ba(cfg, cam, mesh)
    T_opt, pts_opt, _ = solve(prob)
    after = _pose_errs(T_opt, T_gt)
    assert after.max() < 5e-3, after


def test_dist_works_on_smaller_mesh():
    prob, cam, T_gt, pts_gt = _make_problem(M=256)
    cfg = _cfg(iters=5)
    mesh = M.points_mesh(n_devices=4)
    solve = dist_ba.make_dist_ba(cfg, cam, mesh)
    T_opt, pts_opt, _ = solve(prob)
    assert np.isfinite(np.asarray(T_opt)).all()
    assert np.isfinite(np.asarray(pts_opt)).all()
