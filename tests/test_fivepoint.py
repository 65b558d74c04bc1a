"""Five-point minimal essential solver (ops/fivepoint.py).

Validates the TPU-native 5-point path (the cv::findEssentialMat/Nistér
parity solver, reference epipolar_geometry.cpp:36-39): exact recovery on
clean minimal samples, and the head-to-head that motivates it — at >=50%
outlier rates 8-point minimal sampling needs all-inlier draws of 8 and
collapses, while 5-point samples keep producing usable hypotheses.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import epipolar as epi
from monocular_visual_odometry_tpu.ops.fivepoint import five_point_essential


def _norm_plane(uv, K):
    return (uv - K[[0, 1], [2, 2]]) / K[[0, 1], [0, 1]]


def _gt_essential(sc):
    T21 = np.linalg.inv(sc.T_c1_c2)
    R, t = T21[:3, :3], T21[:3, 3]
    t = t / np.linalg.norm(t)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    return E / np.linalg.norm(E), T21


def test_minimal_exact_recovery():
    """Clean 5-point samples: some root of each batch matches GT E."""
    sc = syn.synthesize_two_view(n=64, seed=0)
    x1 = _norm_plane(sc.uv1, sc.K).astype(np.float32)
    x2 = _norm_plane(sc.uv2, sc.K).astype(np.float32)
    E_gt, _ = _gt_essential(sc)

    rng = np.random.default_rng(0)
    idx = np.stack([rng.choice(64, 5, replace=False) for _ in range(32)])
    Es, ok = five_point_essential(
        jnp.asarray(x1[idx]), jnp.asarray(x2[idx]), jax.random.PRNGKey(1))
    Es, ok = np.asarray(Es), np.asarray(ok)
    assert ok.any(axis=1).all(), "every sample must yield >=1 real root"

    best = []
    for b in range(32):
        errs = [
            min(np.abs(Es[b, r] / np.linalg.norm(Es[b, r]) - E_gt).max(),
                np.abs(Es[b, r] / np.linalg.norm(Es[b, r]) + E_gt).max())
            for r in range(Es.shape[1]) if ok[b, r]
        ]
        best.append(min(errs))
    best = np.asarray(best)
    # f32 end-to-end; GN polish restores most samples to the noise floor
    assert np.median(best) < 1e-3, np.median(best)
    assert (best < 1e-2).sum() >= 26, best


def test_roots_satisfy_essential_constraints():
    """Returned candidates sit on the essential manifold and annihilate
    their own 5 correspondences."""
    sc = syn.synthesize_two_view(n=32, seed=3)
    x1 = _norm_plane(sc.uv1, sc.K).astype(np.float32)
    x2 = _norm_plane(sc.uv2, sc.K).astype(np.float32)
    rng = np.random.default_rng(1)
    idx = np.stack([rng.choice(32, 5, replace=False) for _ in range(8)])
    Es, ok = five_point_essential(
        jnp.asarray(x1[idx]), jnp.asarray(x2[idx]), jax.random.PRNGKey(2))
    Es, ok = np.asarray(Es), np.asarray(ok)
    h = lambda p: np.concatenate([p, np.ones_like(p[..., :1])], -1)
    all_res = []
    for b in range(8):
        sample_res = []
        for r in range(Es.shape[1]):
            if not ok[b, r]:
                continue
            E = Es[b, r]
            s = np.linalg.svd(E, compute_uv=False)
            assert s[2] < 1e-4 * s[0] + 1e-6          # rank 2
            assert abs(s[0] - s[1]) < 0.05 * s[0]     # equal leading svals
            res = np.einsum("ni,ij,nj->n", h(x2[idx[b]]), E, h(x1[idx[b]]))
            sample_res.append(np.abs(res).max())
        # every sample's BEST root hits the f32 noise floor; stray roots
        # near the tan-grid extremes may be imprecise (RANSAC scores them
        # away), so only the bulk is gated
        assert min(sample_res) < 1e-4, sample_res
        all_res.extend(sample_res)
    all_res = np.asarray(all_res)
    assert (all_res < 1e-2).mean() > 0.8, all_res


@functools.partial(jax.jit, static_argnames=("minimal",))
def _estimate(x1, x2, valid, key, minimal):
    return epi.estimate_essential(
        x1, x2, valid, key, threshold=1.5 / 615.0, n_hypotheses=512,
        minimal=minimal)


def _pose_success(frac, seed, minimal):
    sc = syn.synthesize_two_view(n=256, seed=seed, noise_px=0.5,
                                 outlier_frac=frac)
    x1 = jnp.asarray(_norm_plane(sc.uv1, sc.K), jnp.float32)
    x2 = jnp.asarray(_norm_plane(sc.uv2, sc.K), jnp.float32)
    m = _estimate(x1, x2, jnp.ones(256, bool), jax.random.PRNGKey(seed),
                  minimal)
    R, t, _ = epi.recover_pose_from_E(m.model, x1, x2, m.inliers)
    _, T21 = _gt_essential(sc)
    tg = T21[:3, 3] / np.linalg.norm(T21[:3, 3])
    rot = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(R).T @ T21[:3, :3]) - 1) / 2, -1, 1)))
    te = np.degrees(np.arccos(np.clip(abs(np.dot(np.asarray(t), tg)), -1, 1)))
    return rot < 2.0 and te < 5.0


def test_5pt_beats_8pt_at_55pct_outliers():
    """The VERDICT criterion: at >=50% outliers the 8-point minimal path
    collapses (all-8-inlier draws are ~0.45^8 = 1.7e-3 per sample) while
    5-point sampling keeps working. Measured at commit time: 5pt 6/8,
    8pt 1/8 at 55% outliers over seeds 0..7."""
    seeds = range(8)
    s5 = sum(_pose_success(0.55, s, "5pt") for s in seeds)
    s8 = sum(_pose_success(0.55, s, "8pt") for s in seeds)
    assert s5 >= 4, f"5pt solved only {s5}/8"
    assert s5 > s8, f"5pt ({s5}) must beat 8pt ({s8})"
