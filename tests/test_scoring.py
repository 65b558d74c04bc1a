"""Unit tests for the ORB-SLAM symmetric-transfer-error scores, validated
against a direct numpy transcription of the reference semantics
(motion_estimation.cpp:501-664, with score initialized to zero)."""

import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import scoring


def _np_essential_score(F, uv1, uv2, cand, sigma=1.0):
    th, th_score = 3.841, 5.991
    inv_s2 = 1.0 / sigma**2
    score = 0.0
    good = []
    for i in range(len(uv1)):
        if not cand[i]:
            good.append(False)
            continue
        u1, v1 = uv1[i]
        u2, v2 = uv2[i]
        a2, b2, c2 = F[0] @ [u1, v1, 1], F[1] @ [u1, v1, 1], F[2] @ [u1, v1, 1]
        num2 = a2 * u2 + b2 * v2 + c2
        chi1 = num2**2 / (a2**2 + b2**2) * inv_s2
        ok = True
        if chi1 > th:
            ok = False
        else:
            score += th_score - chi1
        a1 = F[0, 0] * u2 + F[1, 0] * v2 + F[2, 0]
        b1 = F[0, 1] * u2 + F[1, 1] * v2 + F[2, 1]
        c1 = F[0, 2] * u2 + F[1, 2] * v2 + F[2, 2]
        num1 = a1 * u1 + b1 * v1 + c1
        chi2 = num1**2 / (a1**2 + b1**2) * inv_s2
        if chi2 > th:
            ok = False
        else:
            score += th_score - chi2
        good.append(ok)
    return score, np.asarray(good)


def _np_homography_score(H, uv1, uv2, cand, sigma=1.0):
    th = 5.991
    inv_s2 = 1.0 / sigma**2
    Hinv = np.linalg.inv(H)
    score = 0.0
    good = []
    for i in range(len(uv1)):
        if not cand[i]:
            good.append(False)
            continue
        u1, v1 = uv1[i]
        u2, v2 = uv2[i]
        w = Hinv[2] @ [u2, v2, 1]
        x = (Hinv[0] @ [u2, v2, 1]) / w
        y = (Hinv[1] @ [u2, v2, 1]) / w
        chi1 = ((u1 - x) ** 2 + (v1 - y) ** 2) * inv_s2
        ok = True
        if chi1 > th:
            ok = False
        else:
            score += th - chi1
        w = H[2] @ [u1, v1, 1]
        x = (H[0] @ [u1, v1, 1]) / w
        y = (H[1] @ [u1, v1, 1]) / w
        chi2 = ((u2 - x) ** 2 + (v2 - y) ** 2) * inv_s2
        if chi2 > th:
            ok = False
        else:
            score += th - chi2
        good.append(ok)
    return score, np.asarray(good)


def test_essential_score_matches_reference_semantics():
    sc = syn.synthesize_two_view(n=80, seed=0, noise_px=1.0)
    T21 = np.linalg.inv(sc.T_c1_c2)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    Kinv = np.linalg.inv(sc.K)
    F = Kinv.T @ tx @ R @ Kinv
    cand = np.ones(80, bool)
    cand[::7] = False
    ref_score, ref_good = _np_essential_score(F, sc.uv1, sc.uv2, cand)
    ours = scoring.essential_score(
        jnp.asarray(F, dtype=jnp.float32), jnp.asarray(sc.uv1, dtype=jnp.float32),
        jnp.asarray(sc.uv2, dtype=jnp.float32), jnp.asarray(cand))
    assert abs(float(ours.score) - ref_score) < ref_score * 1e-3 + 1e-2
    np.testing.assert_array_equal(np.asarray(ours.inliers), ref_good)


def test_homography_score_matches_reference_semantics():
    sc = syn.synthesize_two_view(n=60, seed=1, planar=True, noise_px=1.0)
    # fit H from all points (DLT)
    A = []
    for (u1, v1), (u2, v2) in zip(sc.uv1, sc.uv2):
        A.append([-u1, -v1, -1, 0, 0, 0, u2 * u1, u2 * v1, u2])
        A.append([0, 0, 0, -u1, -v1, -1, v2 * u1, v2 * v1, v2])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    H /= H[2, 2]
    cand = np.ones(60, bool)
    ref_score, ref_good = _np_homography_score(H, sc.uv1, sc.uv2, cand)
    ours = scoring.homography_score(
        jnp.asarray(H, dtype=jnp.float32), jnp.asarray(sc.uv1, dtype=jnp.float32),
        jnp.asarray(sc.uv2, dtype=jnp.float32), jnp.asarray(cand))
    assert abs(float(ours.score) - ref_score) < ref_score * 1e-3 + 1e-2
    np.testing.assert_array_equal(np.asarray(ours.inliers), ref_good)


def test_prefer_homography_rule():
    assert bool(scoring.prefer_homography(jnp.float32(100.0), jnp.float32(150.0)))
    assert not bool(scoring.prefer_homography(jnp.float32(150.0), jnp.float32(100.0)))
