"""TPU-native ORB-class feature frontend: FAST + Harris + oriented BRIEF.

Replaces ``cv::ORB::detect/compute`` and the grid-uniform keypoint
subsampling of the reference (``/root/reference/src/geometry/
feature_match.cpp:11-84``, params ``config/config.yaml:65-69,94-95``) with a
fully vectorized XLA formulation:

- image pyramid (``level_pyramid`` levels, scale ``scale_factor``)
- FAST-9/16 segment test as bitwise ops over 16 shifted image planes (VPU)
- Harris corner response for ranking (ORB's HARRIS_SCORE), via small convs
- 3x3 non-max suppression + per-level top-N candidates (fixed shapes)
- grid-uniform selection: <=``max_pts_per_grid`` keypoints per
  ``grid_size``-px cell, <=``max_keypoints`` total — a sort+rank
  formulation of ``selectUniformKptsByGrid`` (feature_match.cpp:51-84)
- orientation by intensity centroid over a 31x31 window, computed with
  *separable convolutions* + one gather per keypoint (instead of per-pixel
  patch gathers)
- steered-BRIEF 256-bit descriptors: fixed random pair pattern (classic
  BRIEF generation, seeded), rotated per keypoint, sampled from the
  5x5-box-smoothed pyramid level, bit-packed to [K, 32] uint8

Everything is static-shape: a frame always yields ``max_keypoints`` slots
with a validity mask. Candidate/keypoint counts that vary per frame in the
reference become masks here (SURVEY.md §8.3 "dynamic shapes under jit").

Deliberate deviations from cv::ORB (documented per SURVEY.md §7):
- the BRIEF pair pattern is our own seeded-random pattern, not OpenCV's
  learned table (descriptors only ever match against our own);
- the orientation centroid window is square (separable conv) rather than a
  disc; matching behavior is unaffected since both frames use the same
  operator;
- grid selection keeps the top-scoring (not first-encountered) points per
  cell, fixing the reference's order dependence.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monocular_visual_odometry_tpu.utils.config import OrbConfig

# FAST-9/16: Bresenham circle of radius 3, (dx, dy), clockwise from 12 o'clock.
_FAST_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

_BORDER = 16  # discard detections closer than this to a level's edge


class FrameFeatures(NamedTuple):
    """Fixed-capacity SoA keypoint set (the TPU-native ``Frame`` feature
    block, cf. frame.h keypoints_/descriptors_)."""

    kpts: jnp.ndarray     # [K, 2] (x, y) in level-0 pixel coords
    scores: jnp.ndarray   # [K] Harris response
    angles: jnp.ndarray   # [K] orientation (radians)
    levels: jnp.ndarray   # [K] pyramid level index
    desc: jnp.ndarray     # [K, 32] uint8 bit-packed 256-bit descriptor
    valid: jnp.ndarray    # [K] bool

    @property
    def n_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


def brief_pattern(seed: int = 42, n_bits: int = 256, patch_radius: int = 15) -> np.ndarray:
    """Fixed random BRIEF pair pattern [n_bits, 4] = (x1, y1, x2, y2),
    Gaussian(0, patch/5) clipped to the patch (classic BRIEF-II)."""
    rng = np.random.default_rng(seed)
    sigma = patch_radius / 2.2
    pts = np.clip(
        np.round(rng.normal(0.0, sigma, size=(n_bits, 4))), -patch_radius, patch_radius
    ).astype(np.int32)
    return pts


_PATTERN = brief_pattern()


# ---------------------------------------------------------------------------
# small convolution helpers (XLA convs; NCHW with singleton batch/channel)
# ---------------------------------------------------------------------------


def _correlate2d(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """'same' cross-correlation of [H,W] with a small static kernel."""
    k = jnp.asarray(kernel, dtype=img.dtype)
    out = jax.lax.conv_general_dilated(
        img[None, None], k[None, None],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _correlate_sep(img: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Separable 'same' correlation: column kernel then row kernel."""
    out = _correlate2d(img, np.asarray(ky, dtype=np.float32).reshape(-1, 1))
    return _correlate2d(out, np.asarray(kx, dtype=np.float32).reshape(1, -1))


def _box_blur(img: jnp.ndarray, size: int) -> jnp.ndarray:
    k = np.full(size, 1.0 / size, dtype=np.float32)
    return _correlate_sep(img, k, k)


# ---------------------------------------------------------------------------
# FAST + Harris
# ---------------------------------------------------------------------------


def fast_corner_mask(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 segment test. ``img`` [H,W] float; returns bool [H,W].

    The 16 circle pixels are materialized as shifted copies (pure VPU work);
    the >=9-contiguous-arc test is a run-length bit trick on a 32-bit mask.
    """
    H, W = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    center = img
    bright_bits = jnp.zeros((H, W), dtype=jnp.uint32)
    dark_bits = jnp.zeros((H, W), dtype=jnp.uint32)
    for i, (dx, dy) in enumerate(_FAST_OFFSETS):
        p = jax.lax.dynamic_slice(pad, (3 + int(dy), 3 + int(dx)), (H, W))
        bright_bits |= (p > center + threshold).astype(jnp.uint32) << i
        dark_bits |= (p < center - threshold).astype(jnp.uint32) << i

    def has_run9(m16: jnp.ndarray) -> jnp.ndarray:
        m = m16 | (m16 << 16)          # duplicate for wraparound arcs
        a = m & (m >> 1)               # runs >= 2
        b = a & (a >> 2)               # runs >= 4
        c = b & (b >> 4)               # runs >= 8
        d = c & (m >> 8)               # runs >= 9
        return (d & jnp.uint32(0xFFFF)) != 0

    return has_run9(bright_bits) | has_run9(dark_bits)


def harris_response(img: jnp.ndarray, k: float = 0.04, window: int = 7) -> jnp.ndarray:
    """Harris corner response (ORB's ranking score), [H,W] float32."""
    sobel_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32) / 8.0
    sobel_y = sobel_x.T
    ix = _correlate2d(img, sobel_x)
    iy = _correlate2d(img, sobel_y)
    w = np.full(window, 1.0 / window, dtype=np.float32)
    ixx = _correlate_sep(ix * ix, w, w)
    iyy = _correlate_sep(iy * iy, w, w)
    ixy = _correlate_sep(ix * iy, w, w)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression mask."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= m


# ---------------------------------------------------------------------------
# pyramid + candidate detection
# ---------------------------------------------------------------------------


def pyramid_shapes(height: int, width: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    return [
        (max(int(round(height / scale**l)), 2 * _BORDER + 8),
         max(int(round(width / scale**l)), 2 * _BORDER + 8))
        for l in range(n_levels)
    ]


def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Static [n_out, n_in] bilinear interpolation matrix (align-corners
    false, matching jax.image.resize semantics)."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        j0 = int(np.floor(src))
        f = src - j0
        j0c = min(max(j0, 0), n_in - 1)
        j1c = min(max(j0 + 1, 0), n_in - 1)
        A[i, j0c] += 1.0 - f
        A[i, j1c] += f
    return A


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float) -> list[jnp.ndarray]:
    """Bilinear image pyramid; level 0 is the input [H,W] float32 in [0,255].

    Resizing is expressed as two dense matmuls with static interpolation
    matrices (rows @ img @ cols^T): on TPU this runs on the MXU, whereas
    jax.image.resize lowers to gathers.
    """
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        h_in, w_in = levels[-1].shape
        h_out, w_out = shapes[l]
        Ar = jnp.asarray(_interp_matrix(h_out, h_in))
        Ac = jnp.asarray(_interp_matrix(w_out, w_in))
        levels.append(Ar @ levels[-1] @ Ac.T)
    return levels


def _level_candidates(img_l: jnp.ndarray, n_cand: int, threshold: float,
                      harris_k: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``n_cand`` FAST+Harris corners at one pyramid level.
    Returns (xy [n,2] int32 level coords, score [n]); invalid slots have
    score -inf."""
    H, W = img_l.shape
    fast = fast_corner_mask(img_l, threshold)
    harris = harris_response(img_l, k=harris_k)
    score = jnp.where(fast & _nms3(harris), harris, -jnp.inf)
    # kill borders
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (xs >= _BORDER) & (xs < W - _BORDER) & (ys >= _BORDER) & (ys < H - _BORDER)
    score = jnp.where(inside, score, -jnp.inf)
    flat = score.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, n_cand)
    xy = jnp.stack([top_idx % W, top_idx // W], axis=-1).astype(jnp.int32)
    return xy, top_scores


def grid_select(xy0: jnp.ndarray, scores: jnp.ndarray, levels: jnp.ndarray,
                valid: jnp.ndarray, *, grid_size: int, max_per_cell: int,
                max_total: int, width: int) -> jnp.ndarray:
    """Grid-uniform selection (selectUniformKptsByGrid, feature_match.cpp:51-84).

    Sort-based, O(C log C), no scatter loops: candidates sorted by
    (cell, -score); within-cell rank via searchsorted on the sorted cell
    ids; keep rank < max_per_cell; then global top-``max_total`` by score.

    Returns indices [max_total] into the candidate arrays; slot i is valid
    iff the returned gathered ``valid`` flag holds (invalid candidates sort
    to the back and are masked by the caller via scores=-inf).
    """
    n_cells_x = (width + grid_size - 1) // grid_size
    cell = (xy0[:, 1] // grid_size) * n_cells_x + (xy0[:, 0] // grid_size)
    cell = jnp.where(valid, cell, jnp.iinfo(jnp.int32).max)
    # sort by cell, tie-break by descending score: encode key as float64-safe
    # composite using argsort on (cell, -score) via lexsort-style two-pass:
    order_by_score = jnp.argsort(-scores)                     # best first (stable)
    cell_sorted_by_score = cell[order_by_score]
    order = jnp.argsort(cell_sorted_by_score, stable=True)    # within cell keeps score order
    perm = order_by_score[order]                              # final: by cell, best-first
    cells_final = cell[perm]
    first_of_cell = jnp.searchsorted(cells_final, cells_final, side="left")
    rank_in_cell = jnp.arange(cells_final.shape[0], dtype=jnp.int32) - first_of_cell.astype(jnp.int32)
    keep = (rank_in_cell < max_per_cell) & valid[perm]
    kept_scores = jnp.where(keep, scores[perm], -jnp.inf)
    _, top = jax.lax.top_k(kept_scores, max_total)
    return perm[top]


# ---------------------------------------------------------------------------
# orientation + descriptors
# ---------------------------------------------------------------------------


def _centroid_moment_maps(img_l: jnp.ndarray, radius: int = 15) -> tuple[jnp.ndarray, jnp.ndarray]:
    """m10 and m01 intensity-centroid maps over a (2r+1)^2 window, as two
    separable correlations each (MXU/VPU work instead of per-kpt gathers)."""
    ramp = np.arange(-radius, radius + 1, dtype=np.float32)
    ones = np.ones(2 * radius + 1, dtype=np.float32)
    m10 = _correlate_sep(img_l, ones, ramp)   # sum_x dx * I
    m01 = _correlate_sep(img_l, ramp, ones)   # sum_y dy * I
    return m10, m01


def _gather_pixels(img_pad: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    return img_pad[ys, xs]


def _descriptors_at_level(img_l: jnp.ndarray, kpts_l: jnp.ndarray,
                          angles: jnp.ndarray) -> jnp.ndarray:
    """Steered-BRIEF bits for keypoints at one level.

    kpts_l: [K,2] float level coords; angles: [K]. Returns [K,32] uint8.
    Out-of-range coords must be pre-clamped by the caller.
    """
    PAD = 24  # covers rotated patch radius 15*sqrt(2) ~= 22
    img_pad = jnp.pad(_box_blur(img_l, 5), PAD, mode="edge")
    pat = jnp.asarray(_PATTERN, dtype=jnp.float32)  # [256,4]
    ca, sa = jnp.cos(angles), jnp.sin(angles)       # [K]

    def rot(px, py):
        # [K,256] rotated integer offsets
        rx = jnp.round(ca[:, None] * px[None, :] - sa[:, None] * py[None, :]).astype(jnp.int32)
        ry = jnp.round(sa[:, None] * px[None, :] + ca[:, None] * py[None, :]).astype(jnp.int32)
        return rx, ry

    x0 = jnp.round(kpts_l[:, 0]).astype(jnp.int32) + PAD
    y0 = jnp.round(kpts_l[:, 1]).astype(jnp.int32) + PAD
    r1x, r1y = rot(pat[:, 0], pat[:, 1])
    r2x, r2y = rot(pat[:, 2], pat[:, 3])
    i1 = _gather_pixels(img_pad, y0[:, None] + r1y, x0[:, None] + r1x)  # [K,256]
    i2 = _gather_pixels(img_pad, y0[:, None] + r2y, x0[:, None] + r2x)
    bits = (i1 < i2).astype(jnp.uint8)                                   # [K,256]
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    return jnp.sum(bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1,
                   dtype=jnp.uint8)


# ---------------------------------------------------------------------------
# top-level frontend
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "scale", "n_candidates", "max_keypoints",
                     "grid_size", "max_per_cell"),
)
def detect_and_describe(
    img: jnp.ndarray,
    *,
    threshold: float = 20.0,
    n_levels: int = 4,
    scale: float = 1.2,
    n_candidates: int = 8000,
    max_keypoints: int = 1024,
    grid_size: int = 16,
    max_per_cell: int = 8,
    harris_k: float = 0.04,
) -> FrameFeatures:
    """Full frontend: pyramid -> FAST/Harris -> grid top-K -> orientation ->
    steered BRIEF. ``img`` is [H,W] float32 (grayscale, 0..255).

    Mirrors the reference's calcKeyPoints + calcDescriptors
    (feature_match.cpp:11-48) with its parameters
    (number_of_keypoints_to_extract=8000 candidates, <=1500 kept,
    16px grid, <=8 per cell).
    """
    H, W = img.shape
    pyr = build_pyramid(img, n_levels, scale)

    # candidate budget per level ~ proportional to area (like cv::ORB)
    areas = [float(p.shape[0] * p.shape[1]) for p in pyr]
    total_area = sum(areas)
    n_per_level = [max(128, int(n_candidates * a / total_area)) for a in areas]

    xs, ss, ls = [], [], []
    for l, img_l in enumerate(pyr):
        xy, sc = _level_candidates(img_l, n_per_level[l], threshold, harris_k)
        factor = scale**l
        xs.append(xy.astype(jnp.float32) * factor)
        ss.append(sc)
        ls.append(jnp.full(xy.shape[0], l, dtype=jnp.int32))
    cand_xy = jnp.concatenate(xs)        # [C,2] level-0 coords
    cand_score = jnp.concatenate(ss)     # [C]
    cand_level = jnp.concatenate(ls)     # [C]
    cand_valid = jnp.isfinite(cand_score)

    sel = grid_select(
        cand_xy.astype(jnp.int32), cand_score, cand_level, cand_valid,
        grid_size=grid_size, max_per_cell=max_per_cell,
        max_total=max_keypoints, width=W,
    )
    kpts = cand_xy[sel]
    scores = cand_score[sel]
    levels = cand_level[sel]
    valid = jnp.isfinite(scores)
    scores = jnp.where(valid, scores, 0.0)

    # orientation + descriptors, per level with masked merge
    angles = jnp.zeros(max_keypoints, dtype=jnp.float32)
    desc = jnp.zeros((max_keypoints, 32), dtype=jnp.uint8)
    for l, img_l in enumerate(pyr):
        Hl, Wl = img_l.shape
        on_level = valid & (levels == l)
        k_l = kpts / (scale**l)
        k_l = jnp.stack(
            [jnp.clip(k_l[:, 0], _BORDER, Wl - 1 - _BORDER),
             jnp.clip(k_l[:, 1], _BORDER, Hl - 1 - _BORDER)],
            axis=-1,
        )
        m10, m01 = _centroid_moment_maps(img_l)
        yi = jnp.round(k_l[:, 1]).astype(jnp.int32)
        xi = jnp.round(k_l[:, 0]).astype(jnp.int32)
        ang_l = jnp.arctan2(m01[yi, xi], m10[yi, xi])
        angles = jnp.where(on_level, ang_l, angles)
        d_l = _descriptors_at_level(img_l, k_l, ang_l)
        desc = jnp.where(on_level[:, None], d_l, desc)

    return FrameFeatures(kpts=kpts, scores=scores, angles=angles,
                         levels=levels, desc=desc, valid=valid)


def features_from_config(img: jnp.ndarray, cfg: OrbConfig) -> FrameFeatures:
    return detect_and_describe(
        img,
        threshold=cfg.score_threshold,
        n_levels=cfg.n_levels,
        scale=cfg.scale_factor,
        n_candidates=cfg.num_keypoints,
        max_keypoints=cfg.max_keypoints,
        grid_size=cfg.grid_size,
        max_per_cell=cfg.max_pts_per_grid,
        harris_k=cfg.harris_k,
    )
