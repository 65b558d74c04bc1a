"""Closed-form real polynomial root solving in pure jnp.

XLA on TPU has no nonsymmetric eigendecomposition, so companion-matrix
tricks (numpy.roots) are unavailable; the quartic needed by P3P is solved
with Ferrari's method built on a trigonometric/Cardano cubic — all real
arithmetic with branch selection via jnp.where, fully batchable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def cubic_one_real_root(b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """One real root of x^3 + b x^2 + c x + d = 0 (batched).

    Uses Cardano for positive discriminant and the trigonometric method for
    the three-real-root case; always returns a real root.
    """
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # Cardano branch (disc >= 0): one real root
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    cbrt = lambda x: jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)
    t_cardano = cbrt(u3) + cbrt(v3)

    # trigonometric branch (disc < 0): three real roots, take k=0
    pm = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (pm * m + jnp.where(pm * m == 0, _EPS, 0.0)), -1.0, 1.0)
    t_trig = m * jnp.cos(jnp.arccos(arg) / 3.0)

    t = jnp.where(disc >= 0, t_cardano, t_trig)
    return t - b / 3.0


def quartic_real_roots(a3: jnp.ndarray, a2: jnp.ndarray, a1: jnp.ndarray,
                       a0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All real roots of x^4 + a3 x^3 + a2 x^2 + a1 x + a0 = 0 (batched).

    Ferrari: depressed quartic y^4 + p y^2 + q y + r, resolvent cubic, two
    quadratics. Returns (roots [..., 4], real_mask [..., 4]); non-real
    slots carry arbitrary values with mask False.
    """
    # depressed quartic substitution x = y - a3/4: y^4 + p y^2 + q y + r
    e = a3 / 4.0
    p = a2 - 3.0 * a3 * a3 / 8.0
    q = a1 - a3 * a2 / 2.0 + a3**3 / 8.0
    r = a0 - a3 * a1 / 4.0 + a3 * a3 * a2 / 16.0 - 3.0 * a3**4 / 256.0

    # resolvent cubic: z^3 + 2 p z^2 + (p^2 - 4 r) z - q^2 = 0; need z >= 0
    z = cubic_one_real_root(2.0 * p, p * p - 4.0 * r, -q * q)
    z = jnp.maximum(z, 0.0)
    w = jnp.sqrt(z + _EPS)

    # factorization (y^2 + w y + c1)(y^2 - w y + c2) with z = w^2:
    #   c1 + c2 - w^2 = p,  w (c2 - c1) = q,  c1 c2 = r
    s = q / (2.0 * w)
    c1 = (p + z) / 2.0 - s
    c2 = (p + z) / 2.0 + s

    def quad(root_sign, bq, cq):
        disc = bq * bq / 4.0 - cq
        ok = disc >= 0
        sqd = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-bq / 2.0 + root_sign * sqd, ok)

    y0, ok0 = quad(+1.0, w, c1)
    y1, ok1 = quad(-1.0, w, c1)
    y2, ok2 = quad(+1.0, -w, c2)
    y3, ok3 = quad(-1.0, -w, c2)
    roots = jnp.stack([y0, y1, y2, y3], axis=-1) - e[..., None]
    mask = jnp.stack([ok0, ok1, ok2, ok3], axis=-1)
    return roots, mask


def polish_quartic_roots(a3, a2, a1, a0, roots, iterations: int = 2):
    """Newton-polish quartic roots (f32 Ferrari benefits from 1-2 steps)."""
    for _ in range(iterations):
        f = (((roots + a3[..., None]) * roots + a2[..., None]) * roots
             + a1[..., None]) * roots + a0[..., None]
        df = ((4.0 * roots + 3.0 * a3[..., None]) * roots
              + 2.0 * a2[..., None]) * roots + a1[..., None]
        roots = roots - f / jnp.where(jnp.abs(df) < _EPS, _EPS, df)
    return roots
