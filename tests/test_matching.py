"""Tests for the MXU Hamming matcher."""

import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.data import synthetic as syn
from monocular_visual_odometry_tpu.ops import features as F
from monocular_visual_odometry_tpu.ops import matching as M


def _rand_desc(rng, k):
    return rng.integers(0, 256, size=(k, 32), dtype=np.uint8)


def _np_hamming(a, b):
    return np.unpackbits(np.bitwise_xor(a[:, None, :], b[None, :, :]), axis=-1).sum(-1)


def test_hamming_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    d1, d2 = _rand_desc(rng, 64), _rand_desc(rng, 96)
    v1, v2 = np.ones(64, bool), np.ones(96, bool)
    ours = np.asarray(M.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                       jnp.asarray(v1), jnp.asarray(v2)))
    np.testing.assert_allclose(ours, _np_hamming(d1, d2), atol=0)


def test_hamming_invalid_masked():
    rng = np.random.default_rng(1)
    d1, d2 = _rand_desc(rng, 8), _rand_desc(rng, 8)
    v1 = np.array([True] * 4 + [False] * 4)
    v2 = np.ones(8, bool)
    d = np.asarray(M.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2),
                                    jnp.asarray(v1), jnp.asarray(v2)))
    assert (d[4:] >= 1e8).all()
    assert (d[:4] <= 256).all()


def test_self_match_identity():
    """Matching a descriptor set against itself must return the identity."""
    rng = np.random.default_rng(2)
    d = _rand_desc(rng, 128)
    v = jnp.ones(128, bool)
    kp = jnp.asarray(rng.uniform(0, 400, size=(128, 2)), dtype=jnp.float32)
    m = M.match_features(jnp.asarray(d), jnp.asarray(d), v, v, kp, kp,
                         method=3, max_pixel_dist=50.0)
    valid = np.asarray(m.valid)
    assert valid.sum() == 128
    np.testing.assert_array_equal(np.asarray(m.query_idx)[valid],
                                  np.asarray(m.train_idx)[valid])
    assert np.asarray(m.dist)[valid].max() == 0


def test_radius_gating():
    """Method 3 must refuse matches beyond the pixel radius."""
    rng = np.random.default_rng(3)
    d = _rand_desc(rng, 16)
    v = jnp.ones(16, bool)
    kp1 = jnp.asarray(np.zeros((16, 2)), dtype=jnp.float32)
    kp2 = jnp.asarray(np.full((16, 2), 200.0), dtype=jnp.float32)  # 283 px away
    m = M.match_features(jnp.asarray(d), jnp.asarray(d), v, v, kp1, kp2,
                         method=3, max_pixel_dist=50.0)
    assert int(m.n_valid) == 0


def test_dedup_unique_train():
    """Two queries with the same best train index -> only the closer wins."""
    rng = np.random.default_rng(4)
    base = _rand_desc(rng, 1)[0]
    near = base.copy()
    near[0] ^= 0x01  # 1 bit away
    far = base.copy()
    far[0] ^= 0x07
    far[1] ^= 0x03   # 5 bits away
    d1 = np.stack([near, far])          # two queries
    d2 = base[None]                      # one train
    v1, v2 = jnp.ones(2, bool), jnp.ones(1, bool)
    m = M.match_features(jnp.asarray(d1), jnp.asarray(d2), v1, v2, method=1)
    valid = np.asarray(m.valid)
    assert valid.sum() == 1
    assert np.asarray(m.query_idx)[valid][0] == 0  # the 1-bit query won


def test_lowe_ratio_rejects_ambiguous():
    rng = np.random.default_rng(5)
    base = _rand_desc(rng, 1)[0]
    # train set: two nearly identical candidates -> ambiguous -> reject
    t0 = base.copy(); t0[0] ^= 0x01
    t1 = base.copy(); t1[0] ^= 0x02
    d2 = np.stack([t0, t1])
    m = M.match_features(jnp.asarray(base[None]), jnp.asarray(d2),
                         jnp.ones(1, bool), jnp.ones(2, bool), method=2)
    assert int(m.n_valid) == 0
    # train set: one close, one far -> accept
    t1b = _rand_desc(rng, 1)[0]
    m2 = M.match_features(jnp.asarray(base[None]), jnp.asarray(np.stack([t0, t1b])),
                          jnp.ones(1, bool), jnp.ones(2, bool), method=2)
    assert int(m2.n_valid) == 1


def test_end_to_end_two_frame_matching():
    """Detect+describe two nearby rendered frames, match, and check that
    matched pairs are geometrically consistent with GT epipolar geometry."""
    planes = syn.default_scene(0)
    K = np.array([[615.0, 0, 320], [0, 615, 240], [0, 0, 1]])
    poses = syn.make_trajectory(8, translation_step=0.06)
    img1 = syn.render_frame(poses[0], planes, K).astype(np.float32)
    img2 = syn.render_frame(poses[4], planes, K).astype(np.float32)
    f1 = F.detect_and_describe(jnp.asarray(img1), max_keypoints=512)
    f2 = F.detect_and_describe(jnp.asarray(img2), max_keypoints=512)
    m = M.match_features(f1.desc, f2.desc, f1.valid, f2.valid, f1.kpts, f2.kpts,
                         method=3, max_pixel_dist=100.0)
    n = int(m.n_valid)
    assert n > 60, f"only {n} matches between nearby frames"
    # GT epipolar residual for matched pairs
    T12 = np.linalg.inv(poses[0]) @ poses[4]
    T21 = np.linalg.inv(T12)
    R, t = T21[:3, :3], T21[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    Fm = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    valid = np.asarray(m.valid)
    p1 = np.asarray(f1.kpts)[np.asarray(m.query_idx)[valid]]
    p2 = np.asarray(f2.kpts)[np.asarray(m.train_idx)[valid]]
    h1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    h2 = np.concatenate([p2, np.ones((len(p2), 1))], 1)
    lines = h1 @ Fm.T
    # symmetric-ish: distance from p2 to epipolar line of p1
    d = np.abs(np.sum(h2 * lines, 1)) / np.linalg.norm(lines[:, :2], axis=1)
    inlier_frac = (d < 3.0).mean()
    assert inlier_frac > 0.6, f"epipolar inlier fraction {inlier_frac:.2f}"


def test_mean_pixel_displacement():
    kp1 = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    kp2 = jnp.asarray([[3.0, 4.0], [10.0, 5.0]])
    m = M.Matches(query_idx=jnp.asarray([0, 1]), train_idx=jnp.asarray([0, 1]),
                  dist=jnp.zeros(2), valid=jnp.asarray([True, True]))
    assert abs(float(M.mean_pixel_displacement(kp1, kp2, m)) - 5.0) < 1e-6


def test_ambiguity_gate_rejects_exact_repeats():
    """method3_ambiguity_ratio (off by default): on EXACT repeated texture
    the best and second-best Hamming distances are both ~0 and the argmin
    winner is an arbitrary alias. The gate must reject those ambiguous
    matches while keeping unique ones — the scene-family-B rescue
    (docs/ROBUSTNESS.md)."""
    rng = np.random.default_rng(3)
    K = 8
    # three distinct descriptors; trains 0 and 1 are EXACT DUPLICATES
    d_unique = rng.integers(0, 256, (K, 32)).astype(np.uint8)
    train = d_unique.copy()
    train[1] = train[0]                      # duplicated descriptor
    query = d_unique.copy()
    valid = jnp.ones(K, bool)
    kpts = jnp.asarray(rng.uniform(0, 100, (K, 2)).astype(np.float32))

    # without the gate: query 0 matches SOME copy of its descriptor
    m_off = M.match_features(
        jnp.asarray(query), jnp.asarray(train), valid, valid, kpts, kpts,
        method=3, max_pixel_dist=1e6)
    assert bool(m_off.valid[0])

    # with the gate: the ambiguous query-0 match is rejected, the unique
    # ones survive
    m_on = M.match_features(
        jnp.asarray(query), jnp.asarray(train), valid, valid, kpts, kpts,
        method=3, max_pixel_dist=1e6, ambiguity_ratio=0.8)
    assert not bool(m_on.valid[0]), "exact-repeat match must be rejected"
    assert not bool(m_on.valid[1])
    kept = np.asarray(m_on.valid)[2:]
    assert kept.sum() >= K - 4, kept
