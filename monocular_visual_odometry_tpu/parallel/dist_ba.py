"""Distributed sliding-window BA over a device mesh.

The multi-device/multi-host form of ``models.ba`` (SURVEY.md §2.3, §5.7):

- the landmark pool is block-sharded over the ``points`` mesh axis;
- every device computes residuals/Jacobians for all window observations
  (tiny: W x K) against an all-gathered copy of the points (M x 3, KBs);
- each device eliminates ONLY its own point blocks (the per-point 3x3
  Schur reduction is embarrassingly parallel);
- the reduced camera system contributions are combined with ``psum`` over
  ICI/DCN and the dense [6W, 6W] solve is replicated;
- landmark back-substitution happens shard-locally, so updated points
  never leave their device.

Structural cousin of sequence-parallel attention sharding applied to the
BA normal equations (SURVEY.md §5.7): the big axis (map points) is
partitioned, the small coupled system (cameras) is reduced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monocular_visual_odometry_tpu.models import ba as BA
from monocular_visual_odometry_tpu.ops import lie
from monocular_visual_odometry_tpu.ops.camera import Camera
from monocular_visual_odometry_tpu.parallel.mesh import POINTS_AXIS
from monocular_visual_odometry_tpu.utils.config import VOConfig


def _dist_lm(cfg: VOConfig, cam: Camera, T_c_w0, obs_uv, obs_pid, obs_valid,
             frame_valid, pts_shard, pt_used_shard):
    """shard_map body: full LM loop with point blocks sharded on
    POINTS_AXIS. pts_shard: [M/D, 3]; everything else replicated."""
    axis = POINTS_AXIS
    W = cfg.ba.window
    info = jnp.asarray(cfg.ba.information_matrix, dtype=jnp.float32).reshape(2, 2)
    huber = cfg.ba.huber_delta
    M_loc = pts_shard.shape[0]
    my_shard = jax.lax.axis_index(axis)
    offset = my_shard * M_loc
    n_obs = jnp.maximum(jnp.sum(obs_valid), 1)

    def full_pts(p_shard):
        return jax.lax.all_gather(p_shard, axis, tiled=True)      # [M,3]

    def cost_fn(T_c_w, p_shard):
        prob = BA.BAProblem(T_c_w=T_c_w, obs_uv=obs_uv, obs_pid=obs_pid,
                            obs_valid=obs_valid, pts=full_pts(p_shard),
                            pt_used=jnp.zeros(1, bool), frame_valid=frame_valid)
        r, _, _ = BA._residuals_and_jacobians(prob, cam, info)
        w = BA._robust_weights(r, obs_valid, info, huber)
        e2 = (r[..., 0] ** 2 * info[0, 0] + r[..., 1] ** 2 * info[1, 1]
              + 2.0 * r[..., 0] * r[..., 1] * info[0, 1])
        return jnp.sum(w * e2)

    def lm_step(carry, _):
        T_c_w, p_shard, lam = carry
        pts = full_pts(p_shard)
        prob = BA.BAProblem(T_c_w=T_c_w, obs_uv=obs_uv, obs_pid=obs_pid,
                            obs_valid=obs_valid, pts=pts,
                            pt_used=jnp.zeros(1, bool), frame_valid=frame_valid)
        r, J_c, J_p = BA._residuals_and_jacobians(prob, cam, info)
        w = BA._robust_weights(r, obs_valid, info, huber)

        Wr2 = jnp.einsum("ab,wkb->wka", info, r) * w[..., None]
        JcW = jnp.einsum("wkai,ab->wkbi", J_c, info) * w[..., None, None]
        JpW = jnp.einsum("wkai,ab->wkbi", J_p, info) * w[..., None, None]

        H_cc = jnp.einsum("wkai,wkaj->wij", JcW, J_c)
        g_c = jnp.einsum("wkai,wka->wi", J_c, Wr2)

        # gauge anchors (same policy as models.ba: two oldest valid frames)
        fixed = ~frame_valid
        order = jnp.arange(W - 1, -1, -1)
        rev_valid = frame_valid[order]
        oldest = W - 1 - jnp.argmax(rev_valid)
        second = W - 1 - jnp.argmax(rev_valid.at[W - 1 - oldest].set(False))
        fixed = fixed | (jnp.arange(W) == oldest) | (jnp.arange(W) == second)
        H_cc = H_cc + jnp.where(fixed, 1e8, 0.0)[:, None, None] * jnp.eye(
            6, dtype=r.dtype)[None]
        g_c = jnp.where(fixed[:, None], 0.0, g_c)

        # shard-local landmark elimination
        local_pid = obs_pid.reshape(-1) - offset
        in_shard = (local_pid >= 0) & (local_pid < M_loc) & obs_valid.reshape(-1)
        safe_pid = jnp.where(in_shard, local_pid, M_loc)           # M_loc -> drop
        Hpp_obs = jnp.einsum("wkai,wkaj->wkij", JpW, J_p).reshape(-1, 3, 3)
        gp_obs = jnp.einsum("wkai,wka->wki", J_p, Wr2).reshape(-1, 3)
        A = jnp.zeros((M_loc, 3, 3), r.dtype).at[safe_pid].add(Hpp_obs, mode="drop")
        b_p = jnp.zeros((M_loc, 3), r.dtype).at[safe_pid].add(gp_obs, mode="drop")
        # relative Tikhonov floor — same formula as models.ba; agreement is
        # up to f32 summation-order noise, bounded to ~1e-4 relative by the
        # 1e-2 conditioning floor (see the rationale in models/ba.py and
        # the 20-seed gate in test_dist_ba)
        dmax = jnp.maximum(
            A[:, jnp.arange(3), jnp.arange(3)].max(-1), 1e-12)
        A = A + (lam + 1e-2 * dmax)[:, None, None] * jnp.eye(
            3, dtype=r.dtype)[None]
        A = jnp.where(pt_used_shard[:, None, None], A,
                      jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), A.shape))
        A_inv = jnp.linalg.inv(A)

        U_obs = jnp.einsum("wkai,wkaj->wkij", JcW, J_p)            # [W,K,6,3]
        wk_idx = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], obs_pid.shape).reshape(-1)
        U = jnp.zeros((W, M_loc, 6, 3), r.dtype).at[wk_idx, safe_pid].add(
            U_obs.reshape(-1, 6, 3), mode="drop")

        UAinv = jnp.einsum("wpij,pjk->wpik", U, A_inv)
        S_off_local = jnp.einsum("wpik,vplk->wvil", UAinv, U)
        g_red_local = jnp.einsum("wpik,pk->wi", UAinv, b_p)
        # combine the reduced camera system over the mesh (ICI/DCN psum)
        S_off = jax.lax.psum(S_off_local, axis)
        g_corr = jax.lax.psum(g_red_local, axis)

        S = -S_off
        diag = jnp.arange(W)
        S = S.at[diag, diag].add(H_cc + lam * jnp.eye(6, dtype=r.dtype)[None])
        g_red = g_c - g_corr
        S_full = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        delta_c = -jnp.linalg.solve(S_full, g_red.reshape(-1)).reshape(W, 6)
        delta_c = jnp.where(fixed[:, None], 0.0, delta_c)

        rhs = b_p + jnp.einsum("wpij,wi->pj", U, delta_c)
        delta_p = -jnp.einsum("pij,pj->pi", A_inv, rhs)
        delta_p = jnp.where(pt_used_shard[:, None], delta_p, 0.0)

        T_new = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(delta_c, T_c_w)
        p_new = p_shard + delta_p
        cost_old = cost_fn(T_c_w, p_shard)
        cost_new = cost_fn(T_new, p_new)
        accept = cost_new < cost_old
        T_c_w = jnp.where(accept, T_new, T_c_w)
        p_shard = jnp.where(accept, p_new, p_shard)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (T_c_w, p_shard, lam), jnp.where(accept, cost_new, cost_old) / n_obs

    (T_c_w, p_shard, _), costs = jax.lax.scan(
        lm_step,
        (T_c_w0, pts_shard, jnp.asarray(cfg.ba.init_lambda, jnp.float32)),
        None, length=cfg.ba.iterations,
    )
    return T_c_w, p_shard, costs


def _shard_mapped_solver(cfg: VOConfig, cam: Camera, mesh: Mesh):
    """The shard_map-wrapped LM body (landmark blocks over POINTS_AXIS).
    Safe to build inside an enclosing jit trace."""
    spec_rep = P()
    spec_pts = P(POINTS_AXIS)

    body = functools.partial(_dist_lm, cfg, cam)
    # check_vma=False: the LM accept decision mixes shard-varying values
    # (local point blocks) into replicated ones (poses) — the result is
    # still replicated because every shard sees identical psum'd systems,
    # but the static varying-axis checker can't prove that.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                  spec_pts, spec_pts),
        out_specs=(spec_rep, spec_pts, spec_rep),
        check_vma=False,
    )


def dist_ba_solve(cfg: VOConfig, cam: Camera, mesh: Mesh, prob: BA.BAProblem):
    """Run the distributed LM on a BAProblem (callable from inside jit).
    The landmark pool size must divide the mesh size."""
    mapped = _shard_mapped_solver(cfg, cam, mesh)
    return mapped(prob.T_c_w, prob.obs_uv, prob.obs_pid, prob.obs_valid,
                  prob.frame_valid, prob.pts, prob.pt_used)


def make_dist_ba(cfg: VOConfig, cam: Camera, mesh: Mesh):
    """Build a jitted distributed BA solver over ``mesh``.

    Returns solve(prob: BAProblem) -> (T_c_w [W,4,4], pts [M,3], costs).
    The landmark pool size must divide the mesh size.
    """

    @jax.jit
    def solve(prob: BA.BAProblem):
        return dist_ba_solve(cfg, cam, mesh, prob)

    return solve


def ba_update_state_dist(cfg: VOConfig, cam: Camera, mesh: Mesh, st):
    """Distributed counterpart of ``models.ba.ba_update_state``: gather the
    window from VO state, solve with landmark blocks sharded over the mesh,
    write back functionally. This is what the live pipeline calls in mesh
    mode (models.vo.make_fused_step / VOEngine(mesh=...)).

    NOTE: the distributed solver is the JOINT solver — it exists to shard
    the per-point Schur elimination, which fixed-landmark mode doesn't
    have. Mesh mode therefore always optimizes points (the
    ``fix_map_points`` flag only governs the single-device path).
    """
    prob, slots = BA.gather_window(cfg, st)
    T_c_w, pts, _ = dist_ba_solve(cfg, cam, mesh, prob)
    return BA.write_back(cfg, st, prob, slots, T_c_w, pts)
