"""Streaming Hamming nearest-neighbor kernel.

The XLA path of ops.matching materializes the full [K1, K2] distance
matrix in HBM and then reduces it (argmin / top-2). This kernel streams
K2 in VMEM-resident tiles instead, fusing:

  int8 MXU dot ( +/-1 descriptors )  ->  Hamming distance tile
  pixel-radius masking (VPU)         ->  gated distances
  running (best, second, argmin)     ->  [K1] outputs

so the [K1, K2] matrix never exists in HBM — the matcher becomes compute-
bound on the MXU instead of bandwidth-bound (the reference's analogue is
the O(N1*N2) scalar loop of matchByRadiusAndBruteForce,
/root/reference/src/geometry/feature_match.cpp:97-119).

Tile sizes: queries 128/program (grid), train tiled by 512 inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _kernel(q_desc_ref, q_uv_ref, q_uv_alt_ref, q_valid_ref, t_desc_ref,
            t_uv_ref, t_valid_ref, r2_ref, best_ref, second_ref, idx_ref):
    """One grid step: queries tile [TQ, 256] vs ALL train descriptors
    (streamed in tiles of TT) — outputs per-query best/second/argmin.

    Each query carries TWO positions (q_uv, q_uv_alt); the radius gate
    passes if the train point is within radius of EITHER — the union
    motion gate (TrackingConfig.motion_gate_union). Callers without a
    second position pass q_uv twice (identical gate, no extra cost class:
    one more [TQ,TT] distance computation per tile on the VPU)."""
    TQ = q_desc_ref.shape[0]
    TT = 512
    K2 = t_desc_ref.shape[0]
    n_tiles = K2 // TT

    q = q_desc_ref[:]                       # [TQ,256] int8
    qu = q_uv_ref[:]                        # [TQ,2] f32
    qa = q_uv_alt_ref[:]                    # [TQ,2] f32
    qv = q_valid_ref[:]                     # [TQ,1] bool-as-int32
    r2 = r2_ref[0, 0]

    def body(i, carry):
        best, second, idx = carry
        t = t_desc_ref[pl.ds(i * TT, TT), :]            # [TT,256] int8
        dot = jax.lax.dot_general(
            q.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [TQ,TT], exact
        d = (256.0 - dot) * 0.5
        tu = t_uv_ref[pl.ds(i * TT, TT), :]              # [TT,2]
        tv = t_valid_ref[pl.ds(i * TT, TT), :]           # [TT,1]
        du = qu[:, 0:1] - tu[:, 0][None, :]
        dv = qu[:, 1:2] - tu[:, 1][None, :]
        pix2 = du * du + dv * dv
        dua = qa[:, 0:1] - tu[:, 0][None, :]
        dva = qa[:, 1:2] - tu[:, 1][None, :]
        pix2 = jnp.minimum(pix2, dua * dua + dva * dva)
        ok = (pix2 <= r2) & (tv[:, 0][None, :] != 0) & (qv[:, 0][:, None] != 0)
        d = jnp.where(ok, d, _BIG)

        tile_min = jnp.min(d, axis=1)                    # [TQ]
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + i * TT
        # second smallest within the tile
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + i * TT
        d2 = jnp.where(cols == tile_arg[:, None], _BIG, d)
        tile_second = jnp.min(d2, axis=1)

        new_best = jnp.minimum(best, tile_min)
        new_idx = jnp.where(tile_min < best, tile_arg, idx)
        new_second = jnp.minimum(jnp.maximum(best, tile_min),
                                 jnp.minimum(second, tile_second))
        return new_best, new_second, new_idx

    init = (jnp.full((TQ,), _BIG, jnp.float32),
            jnp.full((TQ,), _BIG, jnp.float32),
            jnp.zeros((TQ,), jnp.int32))
    best, second, idx = jax.lax.fori_loop(0, n_tiles, body, init)
    best_ref[:, 0] = best
    second_ref[:, 0] = second
    idx_ref[:, 0] = idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_nn_top2(desc1_pm1: jnp.ndarray, uv1: jnp.ndarray, valid1: jnp.ndarray,
                    desc2_pm1: jnp.ndarray, uv2: jnp.ndarray, valid2: jnp.ndarray,
                    max_pixel_dist: jnp.ndarray, uv1_alt: jnp.ndarray | None = None,
                    *, interpret: bool = False):
    """Per-query nearest + second-nearest Hamming match with radius gating.

    desc*_pm1: [K, 256] int8 in {-1, +1}. K1 must be a multiple of 128 and
    K2 a multiple of 512 (the fixed capacities are powers of two).
    ``uv1_alt`` is an optional SECOND query position per keypoint — the
    radius gate accepts the union of both (see _kernel).
    Returns (best [K1], second [K1], idx [K1] int32).
    """
    K1 = desc1_pm1.shape[0]
    K2 = desc2_pm1.shape[0]
    TQ = 128
    assert K1 % TQ == 0 and K2 % 512 == 0, (K1, K2)
    if uv1_alt is None:
        uv1_alt = uv1

    r2 = (max_pixel_dist * max_pixel_dist).astype(jnp.float32).reshape(1, 1)
    out_shape = (
        jax.ShapeDtypeStruct((K1, 1), jnp.float32),
        jax.ShapeDtypeStruct((K1, 1), jnp.float32),
        jax.ShapeDtypeStruct((K1, 1), jnp.int32),
    )
    grid = (K1 // TQ,)
    qspec = lambda width, dt=None: pl.BlockSpec(
        (TQ, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            qspec(256),                       # q_desc
            qspec(2),                         # q_uv
            qspec(2),                         # q_uv_alt
            qspec(1),                         # q_valid
            full((K2, 256)),                  # t_desc (whole, reused)
            full((K2, 2)),                    # t_uv
            full((K2, 1)),                    # t_valid
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(qspec(1), qspec(1), qspec(1)),
        out_shape=out_shape,
        interpret=interpret,
    )(
        desc1_pm1, uv1.astype(jnp.float32), uv1_alt.astype(jnp.float32),
        valid1.astype(jnp.int32)[:, None],
        desc2_pm1, uv2.astype(jnp.float32), valid2.astype(jnp.int32)[:, None],
        r2,
    )
    return best[:, 0], second[:, 0], idx[:, 0]
