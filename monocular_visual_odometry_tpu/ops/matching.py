"""Binary-descriptor matching on the MXU.

Replaces the reference's three matchers (``/root/reference/src/geometry/
feature_match.cpp:86-260``): FLANN-LSH (method 1), BF-Hamming kNN with
Lowe ratio (method 2), and the radius-constrained brute force (method 3,
the default at every call site, ``config/config.yaml:73-75``), plus
``removeDuplicatedMatches`` (:241-260) and
``computeMeanDistBetweenKeypoints`` (:263-279).

TPU-native formulation: descriptors are 256-bit strings stored bit-packed
as [K, 32] uint8. The full Hamming distance matrix is computed as an int8
*matmul* on the MXU: with descriptors unpacked to +/-1 vectors,
``a . b = 256 - 2 * hamming(a, b)``, so one [K1,256]x[256,K2] matmul yields
all pairwise distances — the reference's O(N1*N2) scalar loop
(feature_match.cpp:97-119) becomes a single systolic-array pass.

All outputs are fixed-capacity ``Matches`` with a validity mask.

Deliberate deviation (SURVEY.md §7): duplicate-trainIdx resolution keeps
the *best-distance* match (deterministic) instead of the reference's
arbitrary first-after-unstable-sort; and distances are true Hamming rather
than method 3's mean-absolute-difference of descriptor bytes (both frames
use our descriptors, so only self-consistency matters).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_visual_odometry_tpu.utils.config import MatchConfig

_INF = jnp.float32(1e9)


def _use_pallas(k1: int, k2: int) -> bool:
    """Route to the Pallas streaming kernel: opt-in via MVO_USE_PALLAS=1 on
    TPU backends with tile-aligned capacities. Benchmarking on v5e showed
    the fixed XLA path (bf16 MXU matmul + 3-reduction top-2) at parity or
    better, so the kernel is kept as an alternative rather than the
    default."""
    import os as _os

    import jax as _jax

    return (_os.environ.get("MVO_USE_PALLAS") == "1"
            and _jax.default_backend() in ("tpu", "axon")
            and k1 % 128 == 0 and k2 % 512 == 0)


class Matches(NamedTuple):
    """Fixed-capacity match set (cv::DMatch array analogue)."""

    query_idx: jnp.ndarray  # [M] int32 index into set 1
    train_idx: jnp.ndarray  # [M] int32 index into set 2
    dist: jnp.ndarray       # [M] float32 Hamming distance
    valid: jnp.ndarray      # [M] bool

    @property
    def n_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """[K,32] uint8 packed -> [K,256] int8 in {-1,+1} (bit=1 -> +1)."""
    bits = (desc[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)[None, None, :]) & 1
    return (bits.reshape(desc.shape[0], 256).astype(jnp.int8) * 2 - 1)


def hamming_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray,
                   valid1: jnp.ndarray, valid2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distances via one MXU matmul.

    desc*: [K,32] uint8 packed; returns [K1,K2] float32 with invalid
    rows/cols set to +inf.

    The +/-1 operands are fed to the MXU as bfloat16 with float32
    accumulation: exact for this value range (products are +/-1, partial
    sums <= 256), and unlike an int8 dot it is guaranteed to hit the
    systolic array on all TPU generations.
    """
    a = unpack_pm1(desc1).astype(jnp.bfloat16)
    b = unpack_pm1(desc2).astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K1,K2], in [-256, 256]
    d = (256.0 - dot) * 0.5
    d = jnp.where(valid1[:, None] & valid2[None, :], d, _INF)
    return d


def top2_min(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best, second, argmin) along the last axis via three reductions.

    XLA's lax.top_k lowers to a full row sort on TPU — ~50x slower than
    these min/argmin reductions for k=2.
    """
    best = jnp.min(d, axis=-1)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    second = jnp.min(jnp.where(cols == idx[..., None], _INF, d), axis=-1)
    return best, second, idx


def pixel_dist2_matrix(kpts1: jnp.ndarray, kpts2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs squared pixel distances, [K1,K2] float32."""
    diff = kpts1[:, None, :] - kpts2[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _dedup_best_per_train(query_idx, train_idx, dist, valid, n_train: int):
    """Keep only the best (min-dist) match per train index
    (removeDuplicatedMatches, feature_match.cpp:241-260, made deterministic).

    Implemented as a scatter-min of composite integer keys
    ``dist * K + query_idx`` into a [n_train] table.
    """
    K = query_idx.shape[0]
    dist_clamped = jnp.minimum(dist, 300.0)  # valid Hamming <= 256; avoid int overflow
    key = (dist_clamped.astype(jnp.int32) * (K + 1) + query_idx).astype(jnp.int32)
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)
    table = jnp.full((n_train,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    safe_train = jnp.where(valid, train_idx, 0)
    table = table.at[safe_train].min(key, mode="drop")
    winner = valid & (table[safe_train] == key)
    return winner


@functools.partial(jax.jit, static_argnames=("method", "ambiguity_ratio"))
def match_features(
    desc1: jnp.ndarray, desc2: jnp.ndarray,
    valid1: jnp.ndarray, valid2: jnp.ndarray,
    kpts1: jnp.ndarray | None = None, kpts2: jnp.ndarray | None = None,
    *,
    method: int = 3,
    max_pixel_dist: float = 50.0,
    xiang_gao_ratio: float = 2.0,
    lowe_ratio: float = 0.8,
    dist_floor: float = 30.0,
    ambiguity_ratio: float = 1.0,
    kpts1_alt: jnp.ndarray | None = None,
) -> Matches:
    """Match descriptor set 1 (query) against set 2 (train).

    Mirrors ``matchFeatures`` (feature_match.cpp:126-239):

    - method 1: global nearest neighbor per query, then keep matches with
      ``dist < max(min_dist_over_all * xiang_gao_ratio, 30)``.
    - method 2: top-2 nearest, Lowe ratio test ``d1 < ratio * d2``.
    - method 3: nearest neighbor within ``max_pixel_dist`` pixels, then the
      same xiang-gao threshold computed over the radius-matched set.

    ``kpts1_alt`` (method 3 only): a SECOND query position per keypoint;
    the radius gate passes if the train point is within ``max_pixel_dist``
    of EITHER position. Tracking uses this to gate around the union of the
    constant-velocity-predicted and the stale-pose projections — the
    prediction centers the gate under fast steady rotation, the stale
    projection covers motion-model overshoot at turn reversals
    (docs/ROBUSTNESS.md, family B).

    Returns one match slot per query keypoint ([K1]-sized ``Matches``);
    duplicates per train index resolved to the best distance.
    """
    K1 = desc1.shape[0]
    K2 = desc2.shape[0]
    max_pixel_dist = jnp.asarray(max_pixel_dist, dtype=jnp.float32)

    if _use_pallas(K1, K2):
        # streaming MXU kernel: no [K1,K2] matrix in HBM; kpts1_alt rides
        # the kernel's second query-position operand (union radius gate)
        from monocular_visual_odometry_tpu.ops.pallas.hamming import hamming_nn_top2

        radius = max_pixel_dist if method == 3 else jnp.float32(1e6)
        uv1 = kpts1 if kpts1 is not None else jnp.zeros((K1, 2), jnp.float32)
        uv2 = kpts2 if kpts2 is not None else jnp.zeros((K2, 2), jnp.float32)
        best, second, train = hamming_nn_top2(
            unpack_pm1(desc1), uv1, valid1, unpack_pm1(desc2), uv2, valid2,
            radius, uv1_alt=kpts1_alt)
    else:
        d = hamming_matrix(desc1, desc2, valid1, valid2)
        if method == 3:
            assert kpts1 is not None and kpts2 is not None
            r2 = pixel_dist2_matrix(kpts1, kpts2)
            if kpts1_alt is not None:
                r2 = jnp.minimum(r2, pixel_dist2_matrix(kpts1_alt, kpts2))
            d = jnp.where(r2 <= max_pixel_dist * max_pixel_dist, d, _INF)
        best, second, train = top2_min(d)

    if method == 2:
        ok = (best < lowe_ratio * second) & (best < _INF)
    else:
        matched = best < _INF
        min_dist = jnp.min(jnp.where(matched, best, _INF))
        thresh = jnp.maximum(min_dist * xiang_gao_ratio, dist_floor)
        ok = matched & (best < thresh)
        if ambiguity_ratio < 1.0:
            # Lowe-style ambiguity gate on top of the radius matcher (off
            # at 1.0 = reference parity, which never ratio-tests method
            # 1/3). On exact repeated texture best == second == 0 and the
            # argmin winner is an arbitrary alias — the strict ratio
            # rejects it (0 < r*0 is false), while a unique perfect match
            # (best 0, second >= 1) passes.
            ok = ok & (best < ambiguity_ratio * second)

    query = jnp.arange(K1, dtype=jnp.int32)
    ok = ok & valid1
    winner = _dedup_best_per_train(query, train, best, ok, K2)
    return Matches(
        query_idx=query,
        train_idx=train.astype(jnp.int32),
        dist=jnp.where(winner, best, _INF),
        valid=winner,
    )


def mean_pixel_displacement(kpts1: jnp.ndarray, kpts2: jnp.ndarray,
                            matches: Matches) -> jnp.ndarray:
    """Mean pixel distance between matched keypoints — the reference's
    init gate statistic (computeMeanDistBetweenKeypoints,
    feature_match.cpp:263-279; used by isVoGoodToInit_, vo.cpp:126-169)."""
    p1 = kpts1[matches.query_idx]
    p2 = kpts2[matches.train_idx]
    dist = jnp.linalg.norm(p1 - p2, axis=-1)
    n = jnp.maximum(matches.n_valid, 1)
    return jnp.sum(jnp.where(matches.valid, dist, 0.0)) / n
