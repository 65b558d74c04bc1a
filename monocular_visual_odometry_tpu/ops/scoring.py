"""ORB-SLAM-style symmetric-transfer-error model scores for E vs H selection.

Vectorized replacements for ``checkEssentialScore`` and
``checkHomographyScore`` (``/root/reference/src/geometry/
motion_estimation.cpp:501-664``), used to choose between the essential and
homography motion hypotheses exactly as the reference does
(:135-156): pick H when score_H / (score_E + score_H) > 0.5, and among
H solutions the one with the largest |normal_z|.

The reference's ``checkHomographyScore`` reads its ``score`` accumulator
uninitialized (motion_estimation.cpp:588, first += at :640 — a latent bug
flagged in SURVEY.md §7); here the accumulator is explicitly zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_CHI2_1DOF = 3.841   # th for the 1-D epipolar point-line distance
_CHI2_2DOF = 5.991   # thScore cap / th for the 2-D transfer distance
_EPS = 1e-9


class ModelScore(NamedTuple):
    score: jnp.ndarray     # scalar
    inliers: jnp.ndarray   # [N] bool — points passing both directions


def essential_score(F: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
                    candidates: jnp.ndarray, sigma: float = 1.0) -> ModelScore:
    """Score an essential hypothesis through its fundamental matrix
    ``F = K^-T E K^-1`` on *pixel* correspondences.

    Per point and per direction: squared point-to-epipolar-line distance
    over sigma^2; contributes ``5.991 - chi2`` when ``chi2 <= 3.841``, else
    0; a point stays an inlier only if both directions pass
    (motion_estimation.cpp:524-581).
    """
    h1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    h2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], axis=-1)
    inv_sigma2 = 1.0 / (sigma * sigma)

    l2 = h1 @ F.T                       # epipolar lines in image 2
    num = jnp.sum(h2 * l2, axis=-1)     # same numerator both directions
    d2_img2 = num**2 / (l2[..., 0] ** 2 + l2[..., 1] ** 2 + _EPS)
    l1 = h2 @ F                         # lines in image 1
    d2_img1 = num**2 / (l1[..., 0] ** 2 + l1[..., 1] ** 2 + _EPS)

    chi1 = d2_img2 * inv_sigma2
    chi2 = d2_img1 * inv_sigma2
    s = (jnp.where(chi1 <= _CHI2_1DOF, _CHI2_2DOF - chi1, 0.0)
         + jnp.where(chi2 <= _CHI2_1DOF, _CHI2_2DOF - chi2, 0.0))
    good = (chi1 <= _CHI2_1DOF) & (chi2 <= _CHI2_1DOF)
    s = jnp.where(candidates, s, 0.0)
    return ModelScore(jnp.sum(s), good & candidates)


def homography_score(H: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
                     candidates: jnp.ndarray, sigma: float = 1.0) -> ModelScore:
    """Score a homography hypothesis by symmetric transfer error on pixels
    (motion_estimation.cpp:585-664, with the uninitialized-score bug fixed).
    """
    Hinv = jnp.linalg.inv(H)
    inv_sigma2 = 1.0 / (sigma * sigma)

    def transfer_err2(M, src, dst):
        h = jnp.concatenate([src, jnp.ones_like(src[..., :1])], axis=-1)
        q = h @ M.T
        w = q[..., 2:3]
        q = q[..., :2] / (w + jnp.where(w >= 0, _EPS, -_EPS))
        return jnp.sum((q - dst) ** 2, axis=-1)

    chi1 = transfer_err2(Hinv, uv2, uv1) * inv_sigma2   # error in image 1
    chi2 = transfer_err2(H, uv1, uv2) * inv_sigma2      # error in image 2
    s = (jnp.where(chi1 <= _CHI2_2DOF, _CHI2_2DOF - chi1, 0.0)
         + jnp.where(chi2 <= _CHI2_2DOF, _CHI2_2DOF - chi2, 0.0))
    good = (chi1 <= _CHI2_2DOF) & (chi2 <= _CHI2_2DOF)
    s = jnp.where(candidates, s, 0.0)
    return ModelScore(jnp.sum(s), good & candidates)


def prefer_homography(score_e: jnp.ndarray, score_h: jnp.ndarray,
                      ratio: float = 0.5) -> jnp.ndarray:
    """ORB-SLAM model selection: H wins when
    score_H / (score_E + score_H) > ratio (motion_estimation.cpp:139-141;
    the code value 0.5 — the README's 0.45 is stale, SURVEY.md §7)."""
    return score_h / (score_e + score_h + _EPS) > ratio
