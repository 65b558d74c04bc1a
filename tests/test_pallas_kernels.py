"""Pallas kernel validation (interpret mode on CPU) against the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.ops import matching as M
from monocular_visual_odometry_tpu.ops.pallas.hamming import hamming_nn_top2


def _setup(k1=256, k2=512, seed=0):
    rng = np.random.default_rng(seed)
    d1 = rng.integers(0, 256, size=(k1, 32), dtype=np.uint8)
    d2 = rng.integers(0, 256, size=(k2, 32), dtype=np.uint8)
    uv1 = rng.uniform(0, 400, (k1, 2)).astype(np.float32)
    uv2 = rng.uniform(0, 400, (k2, 2)).astype(np.float32)
    v1 = rng.uniform(size=k1) > 0.1
    v2 = rng.uniform(size=k2) > 0.1
    return (jnp.asarray(d1), jnp.asarray(uv1), jnp.asarray(v1),
            jnp.asarray(d2), jnp.asarray(uv2), jnp.asarray(v2))


def _xla_reference(d1, uv1, v1, d2, uv2, v2, radius):
    d = M.hamming_matrix(d1, d2, v1, v2)
    r2 = M.pixel_dist2_matrix(uv1, uv2)
    d = jnp.where(r2 <= radius * radius, d, M._INF)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    return -neg2[:, 0], -neg2[:, 1], idx2[:, 0]


def test_streaming_matcher_matches_xla():
    d1, uv1, v1, d2, uv2, v2 = _setup()
    radius = jnp.float32(120.0)
    best_p, second_p, idx_p = hamming_nn_top2(
        M.unpack_pm1(d1), uv1, v1, M.unpack_pm1(d2), uv2, v2, radius,
        interpret=True)
    best_x, second_x, idx_x = _xla_reference(d1, uv1, v1, d2, uv2, v2, radius)
    matched = np.asarray(best_x) < 1e8
    np.testing.assert_allclose(np.asarray(best_p)[matched],
                               np.asarray(best_x)[matched], atol=0)
    np.testing.assert_allclose(np.asarray(second_p)[matched],
                               np.asarray(second_x)[matched], atol=0)
    # argmin may differ only on exact distance ties
    diff = np.asarray(idx_p)[matched] != np.asarray(idx_x)[matched]
    if diff.any():
        dist_at = np.asarray(M.hamming_matrix(d1, d2, v1, v2))
        for q in np.where(matched)[0][diff[: len(diff)]]:
            assert dist_at[q, int(idx_p[q])] == dist_at[q, int(idx_x[q])]


def test_streaming_matcher_radius_zero():
    d1, uv1, v1, d2, uv2, v2 = _setup(seed=1)
    best, second, idx = hamming_nn_top2(
        M.unpack_pm1(d1), uv1, v1, M.unpack_pm1(d2), uv2, v2,
        jnp.float32(0.0), interpret=True)
    assert (np.asarray(best) >= 1e8).all()


def test_streaming_matcher_invalid_masked():
    d1, uv1, v1, d2, uv2, v2 = _setup(seed=2)
    v1 = jnp.zeros_like(v1)
    best, _, _ = hamming_nn_top2(
        M.unpack_pm1(d1), uv1, v1, M.unpack_pm1(d2), uv2, v2,
        jnp.float32(1e6), interpret=True)
    assert (np.asarray(best) >= 1e8).all()


def test_multi_tile_train_axis():
    """K2 = 1024 exercises the streaming loop (2 tiles)."""
    d1, uv1, v1, d2, uv2, v2 = _setup(k1=128, k2=1024, seed=3)
    radius = jnp.float32(1e6)
    best_p, second_p, idx_p = hamming_nn_top2(
        M.unpack_pm1(d1), uv1, v1, M.unpack_pm1(d2), uv2, v2, radius,
        interpret=True)
    best_x, second_x, idx_x = _xla_reference(d1, uv1, v1, d2, uv2, v2, radius)
    np.testing.assert_allclose(np.asarray(best_p), np.asarray(best_x), atol=0)
    np.testing.assert_allclose(np.asarray(second_p), np.asarray(second_x), atol=0)


def test_kernel_union_radius_gate():
    """The kernel's second query position (union motion gate): a train
    point reachable only from the ALT position must match; with uv1_alt
    omitted the gate is identical to the single-position one."""
    rng = np.random.default_rng(5)
    K1, K2 = 128, 512
    d1 = rng.integers(0, 2, (K1, 256)).astype(np.int8) * 2 - 1
    d2 = np.concatenate([d1[:K1], rng.integers(0, 2, (K2 - K1, 256))
                         .astype(np.int8) * 2 - 1])
    uv2 = rng.uniform(0, 640, (K2, 2)).astype(np.float32)
    # primary positions FAR from the matching train points, alt positions
    # exactly on them
    uv1 = uv2[:K1] + 500.0
    uv1_alt = uv2[:K1].copy()
    v1 = np.ones(K1, bool)
    v2 = np.ones(K2, bool)
    best, second, idx = hamming_nn_top2(
        jnp.asarray(d1), jnp.asarray(uv1), jnp.asarray(v1),
        jnp.asarray(d2), jnp.asarray(uv2), jnp.asarray(v2),
        jnp.float32(50.0), uv1_alt=jnp.asarray(uv1_alt), interpret=True)
    # each query's identical descriptor sits at train index i, reachable
    # only through the alt position
    assert np.array_equal(np.asarray(idx), np.arange(K1))
    assert np.all(np.asarray(best) == 0.0)
    # without the alt position the identical-descriptor (distance-0) match
    # is unreachable (a chance radius hit on a RANDOM train point may
    # still occur at Hamming ~128)
    best2, _, _ = hamming_nn_top2(
        jnp.asarray(d1), jnp.asarray(uv1), jnp.asarray(v1),
        jnp.asarray(d2), jnp.asarray(uv2), jnp.asarray(v2),
        jnp.float32(50.0), interpret=True)
    assert np.all(np.asarray(best2) > 0.0)
