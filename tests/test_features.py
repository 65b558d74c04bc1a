"""Tests for the FAST/Harris + oriented-BRIEF frontend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import features as F


def _checkerboard(h=120, w=160, cell=20):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((ys // cell) + (xs // cell)) % 2 * 255.0).astype(np.float32)


def test_fast_detects_l_corners():
    # Bright square on dark background: its 4 corners are L-corners with a
    # >=9-contiguous dark arc. (An ideal checkerboard X-corner has exactly
    # 8 bright / 8 dark circle pixels and is correctly NOT a FAST corner.)
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 255.0
    mask = np.asarray(F.fast_corner_mask(jnp.asarray(img), 20.0))
    assert mask.sum() > 0
    assert mask[18:23, 18:23].sum() >= 1  # corner (20,20) region fires
    assert not mask[32, 32]               # flat interior silent
    assert not mask[32, 20]               # straight edge silent


def test_fast_no_response_on_flat():
    img = jnp.full((64, 64), 128.0)
    assert np.asarray(F.fast_corner_mask(img, 20.0)).sum() == 0


def test_harris_peaks_at_corners():
    img = jnp.asarray(_checkerboard())
    h = np.asarray(F.harris_response(img))
    assert h[40, 40] > h[30, 30]  # corner beats flat
    assert h[40, 40] > h[40, 30]  # corner beats edge


def test_cell_topk_respects_capacity():
    """cell_topk keeps at most k entries per cell and they are the best k."""
    rng = np.random.default_rng(0)
    score = rng.uniform(0, 1, (32, 64)).astype(np.float32)
    v, ys, xs = jax.tree.map(np.asarray, F.cell_topk(jnp.asarray(score), 16, 2))
    assert v.shape == (2 * 4 * 2,)
    cells = (ys // 16) * 4 + (xs // 16)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() <= 2
    # returned values are each cell's true top-2
    for cy in range(2):
        for cx in range(4):
            block = score[cy * 16:(cy + 1) * 16, cx * 16:(cx + 1) * 16]
            got = sorted(v[cells == cy * 4 + cx], reverse=True)
            want = sorted(block.reshape(-1), reverse=True)[:2]
            np.testing.assert_allclose(got, want, rtol=1e-6)


def test_detect_per_cell_cap_on_frame():
    """No (level, 16px-cell) pair exceeds max_pts_per_grid on a real frame."""
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    img = syn.render_frame(np.eye(4), planes, K).astype(np.float32)
    feats = F.detect_and_describe(jnp.asarray(img), max_keypoints=512,
                                  max_per_cell=4)
    valid = np.asarray(feats.valid)
    kp = np.asarray(feats.kpts)[valid]
    lv = np.asarray(feats.levels)[valid]
    # reconstruct atlas cells from level-0 coords (inverse of the mapping in
    # detect_and_describe)
    shapes, offsets, H_A, W_A = F.atlas_geometry(480, 640, 4, 1.2, 16)
    sc = np.asarray([1.2 ** l for l in range(4)])
    xa = np.round(kp[:, 0] / sc[lv] + np.asarray([o[0] for o in offsets])[lv])
    ya = np.round(kp[:, 1] / sc[lv] + np.asarray([o[1] for o in offsets])[lv])
    cells = (ya // 16) * (W_A // 16) + (xa // 16)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() <= 4


def test_detect_on_synthetic_frame():
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    img = syn.render_frame(np.eye(4), planes, K).astype(np.float32)
    feats = F.detect_and_describe(jnp.asarray(img), max_keypoints=512)
    n = int(feats.n_valid)
    assert n > 300, f"only {n} keypoints on a texture-rich frame"
    kp = np.asarray(feats.kpts[np.asarray(feats.valid)])
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < 640).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < 480).all()
    # descriptors are non-trivial: not all zeros, bits vary across keypoints
    d = np.asarray(feats.desc[np.asarray(feats.valid)])
    assert d.any()
    assert len(np.unique(d, axis=0)) > n * 0.9


def test_descriptor_rotation_invariance():
    """A frame and its 90deg-rotated copy must produce matching descriptors
    at corresponding keypoints (steered BRIEF)."""
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    img = syn.render_frame(np.eye(4), planes, K, height=480, width=480).astype(np.float32)
    rot = np.rot90(img).copy()
    f1 = F.detect_and_describe(jnp.asarray(img), max_keypoints=256)
    f2 = F.detect_and_describe(jnp.asarray(rot), max_keypoints=256)
    # map f1 keypoints into rotated frame: (x,y) -> (y, W-1-x)
    v1 = np.asarray(f1.valid)
    kp1 = np.asarray(f1.kpts)[v1]
    d1 = np.asarray(f1.desc)[v1]
    kp2 = np.asarray(f2.kpts)[np.asarray(f2.valid)]
    d2 = np.asarray(f2.desc)[np.asarray(f2.valid)]
    mapped = np.stack([kp1[:, 1], 480 - 1 - kp1[:, 0]], axis=1)
    # for each mapped kpt, find nearest detected kpt in rotated frame
    hits = 0
    matched_ham = []
    for i, m in enumerate(mapped):
        j = np.argmin(np.linalg.norm(kp2 - m, axis=1))
        if np.linalg.norm(kp2[j] - m) < 2.0:
            hits += 1
            ham = bin(int.from_bytes(
                bytes(np.bitwise_xor(d1[i], d2[j]).tolist()), "big")).count("1")
            matched_ham.append(ham)
    assert hits > 30, f"only {hits} repeatable keypoints under rotation"
    med = np.median(matched_ham)
    assert med < 60, f"median Hamming {med} too high: orientation steering broken"


def test_jit_stability_across_frames():
    """Same shapes -> no recompilation; different content -> different output."""
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    poses = syn.make_trajectory(3)
    f = []
    for i in range(2):
        img = syn.render_frame(poses[i], planes, K, height=240, width=320).astype(np.float32)
        f.append(F.detect_and_describe(jnp.asarray(img), max_keypoints=256))
    assert not np.array_equal(np.asarray(f[0].kpts), np.asarray(f[1].kpts))
