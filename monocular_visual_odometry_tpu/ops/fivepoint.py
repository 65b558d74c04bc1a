"""Batched five-point minimal essential-matrix solver.

TPU-native replacement for the minimal solver inside
``cv::findEssentialMat`` (``/root/reference/src/geometry/
epipolar_geometry.cpp:36-39``), which uses Nistér's five-point method.
A five-point sample pins the essential matrix to a 4-dimensional null
space E = x·E1 + y·E2 + z·E3 + E4; the rank/trace constraints

    det(E) = 0,    2 E Eᵀ E − tr(E Eᵀ) E = 0

give 10 cubic equations in (x, y, z). Classic implementations run
Gauss-Jordan on the 10×20 coefficient matrix and extract a degree-10
polynomial (Nistér) or eigen-decompose a 10×10 action matrix (Stewénius).
Neither maps to TPU: the first needs symbolic pivoting, the second a
nonsymmetric eigensolver (CPU-only in XLA).

TPU-native formulation (original to this framework):

1. The 10×20 coefficient matrix is built EXACTLY via two static
   monomial-product tensors (deg1×deg1→deg2 and deg2×deg1→deg3), so the
   whole construction is three einsums — no symbolic algebra at trace
   time, vmappable over the hypothesis batch.
2. Grouping the 20 degree-≤3 monomials by their (x,y)-part yields a
   10×10 matrix M(z) with entries polynomial in z (degrees 0..3). A
   nontrivial (x,y)-monomial vector exists iff det M(z) = 0 — a
   degree-10 polynomial in z whose SIGN we can evaluate anywhere with one
   batched 10×10 determinant.
3. Real roots are found with fixed-shape bracketing + bisection: z =
   tan(θ) maps the whole real line onto a uniform θ grid; sign changes
   between grid nodes give up to MAX_ROOTS brackets per hypothesis;
   40 bisection steps pin each root. No data-dependent control flow.
4. For each root, (x, y) is read from the null vector of M(z*) (batched
   9.. 10×10 eigh of MᵀM), and E is reassembled and projected onto the
   essential manifold.

A random orthonormal remix of the 4-D null-space basis (keyed per call)
makes the "true solution has zero E4 component" failure mode measure-zero.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-12

# ---------------------------------------------------------------------------
# static monomial tables (numpy, built once at import)
# ---------------------------------------------------------------------------

# exponent tuples (i, j, k) for x^i y^j z^k
_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]                 # x y z 1
_DEG2 = [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
         (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]      # 10
_DEG3 = [(3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
         (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3)] + _DEG2  # 20


def _mul_table(out_basis, a_basis, b_basis):
    T = np.zeros((len(out_basis), len(a_basis), len(b_basis)), np.float32)
    lut = {m: i for i, m in enumerate(out_basis)}
    for ia, ma in enumerate(a_basis):
        for ib, mb in enumerate(b_basis):
            m = tuple(x + y for x, y in zip(ma, mb))
            T[lut[m], ia, ib] = 1.0
    return T


_T2 = jnp.asarray(_mul_table(_DEG2, _DEG1, _DEG1))   # [10,4,4]
_T3 = jnp.asarray(_mul_table(_DEG3, _DEG2, _DEG1))   # [20,10,4]

# (x,y)-monomial grouping of the 20 deg-≤3 monomials:
# columns of M(z) over [x³, x²y, xy², y³, x², xy, y², x, y, 1]
_XY_BASIS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
             (1, 0), (0, 1), (0, 0)]
_COL = np.asarray([_XY_BASIS.index((i, j)) for (i, j, _k) in _DEG3], np.int32)
_ZDEG = np.asarray([k for (_i, _j, k) in _DEG3], np.int32)

_MAX_ROOTS = 8        # brackets kept per hypothesis (≤10 real roots exist)
_GRID = 129           # θ-grid nodes over (-π/2, π/2); z = tan(θ)
_BISECT_ITERS = 40
_THETA = jnp.asarray(
    np.linspace(-1.5607, 1.5607, _GRID), jnp.float32)   # tan(±1.5607) ≈ ±100


# ---------------------------------------------------------------------------
# constraint polynomial construction
# ---------------------------------------------------------------------------


def _constraints(Elin: jnp.ndarray) -> jnp.ndarray:
    """10 cubic constraint polynomials from the null-space basis.

    Elin: [3,3,4] — coefficient of each essential-matrix entry over the
    deg-1 basis [x, y, z, 1]. Returns C [10, 20] over _DEG3.
    """
    e = Elin

    def q(a, b):            # lin × lin -> quad   [4],[4] -> [10]
        return jnp.einsum("mab,a,b->m", _T2, a, b)

    def c(qq, a):           # quad × lin -> cubic [10],[4] -> [20]
        return jnp.einsum("mqa,q,a->m", _T3, qq, a)

    # det(E) = e00·m00 − e01·m01 + e02·m02 (cofactor expansion)
    m00 = q(e[1, 1], e[2, 2]) - q(e[1, 2], e[2, 1])
    m01 = q(e[1, 0], e[2, 2]) - q(e[1, 2], e[2, 0])
    m02 = q(e[1, 0], e[2, 1]) - q(e[1, 1], e[2, 0])
    det = c(m00, e[0, 0]) - c(m01, e[0, 1]) + c(m02, e[0, 2])

    # 2 E Eᵀ E − tr(E Eᵀ) E, entrywise (9 cubics)
    EEt = jnp.einsum("mab,ika,jkb->ijm", _T2, e, e)          # [3,3,10]
    tr = EEt[0, 0] + EEt[1, 1] + EEt[2, 2]                   # [10]
    EEtE = jnp.einsum("mqa,ikq,kja->ijm", _T3, EEt, e)       # [3,3,20]
    trE = jnp.einsum("mqa,q,ija->ijm", _T3, tr, e)           # [3,3,20]
    tc = 2.0 * EEtE - trE
    return jnp.concatenate([det[None], tc.reshape(9, 20)], axis=0)


def _m_of_z(Mcoef: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate M(z). Mcoef: [..., 10, 10, 4]; z: [...]. Returns
    [..., 10, 10], scaled to unit max-entry (determinant SIGN preserved;
    raw entries grow like z³ and would overflow f32 determinants)."""
    zp = jnp.stack([jnp.ones_like(z), z, z * z, z * z * z], axis=-1)
    M = jnp.einsum("...ijd,...d->...ij", Mcoef, zp)
    s = jnp.max(jnp.abs(M), axis=(-2, -1), keepdims=True) + _EPS
    return M / s


def _det_sign(Mcoef, z):
    return jnp.linalg.det(_m_of_z(Mcoef, z))


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------


def five_point_essential(x1: jnp.ndarray, x2: jnp.ndarray, key: jax.Array):
    """Solve the five-point problem for a batch of minimal samples.

    x1, x2: [B, 5, 2] normalized-plane correspondences.
    Returns (Es [B, MAX_ROOTS, 3, 3] essential-manifold candidates,
    ok [B, MAX_ROOTS] bool).
    """
    B = x1.shape[0]

    # --- 4-D null space of the 5×9 epipolar constraint (x2ᵀ E x1 = 0)
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                   u1, v1, ones], axis=-1)                    # [B,5,9]
    AtA = jnp.einsum("bmi,bmj->bij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    basis = vecs[..., :4]                                     # [B,9,4]

    # random orthonormal remix of the basis (QR of a keyed Gaussian): the
    # fixed "coefficient of E4 is 1" chart misses solutions orthogonal to
    # E4; a random chart makes that failure measure-zero.
    G = jax.random.normal(key, (B, 4, 4), dtype=x1.dtype)
    Q, _ = jnp.linalg.qr(G)
    basis = basis @ Q                                         # [B,9,4]

    Elin = basis.reshape(B, 3, 3, 4)
    C = jax.vmap(_constraints)(Elin)                          # [B,10,20]
    Mcoef = jnp.zeros((B, 10, 10, 4), x1.dtype).at[
        :, :, _COL, _ZDEG].set(C)                             # [B,10,10,4]

    # --- bracket real roots of det M(z) on the tan grid
    z_grid = jnp.tan(_THETA)                                  # [G]
    f = _det_sign(Mcoef[:, None], jnp.broadcast_to(z_grid, (B, _GRID)))
    sgn = jnp.sign(f)
    change = (sgn[:, :-1] * sgn[:, 1:] < 0)                   # [B,G-1]
    # first MAX_ROOTS bracket indices per row (stable argsort of ~change)
    order = jnp.argsort(
        jnp.where(change, 0, 1), axis=1, stable=True)[:, :_MAX_ROOTS]
    ok = jnp.take_along_axis(change, order, axis=1)           # [B,R]
    lo = _THETA[order]
    hi = _THETA[order + 1]
    f_lo = jnp.take_along_axis(sgn[:, :-1], order, axis=1)

    def bisect(carry, _):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        fm = jnp.sign(_det_sign(Mcoef[:, None], jnp.tan(mid)))
        same = fm * f_lo >= 0
        lo = jnp.where(same, mid, lo)
        f_lo = jnp.where(same, fm, f_lo)
        hi = jnp.where(same, hi, mid)
        return (lo, hi, f_lo), None

    (lo, hi, _), _ = jax.lax.scan(
        bisect, (lo, hi, f_lo), None, length=_BISECT_ITERS)
    z_root = jnp.tan(0.5 * (lo + hi))                         # [B,R]

    # --- (x, y) from the null vector of M(z*)
    M = _m_of_z(Mcoef[:, None], z_root)                       # [B,R,10,10]
    MtM = jnp.einsum("...mi,...mj->...ij", M, M)
    _, V = jnp.linalg.eigh(MtM)
    v = V[..., :, 0]                                          # [B,R,10]
    # v ∝ [x³, x²y, xy², y³, x², xy, y², x, y, 1]; recover (x, y) from the
    # degree pair with the largest denominator (x/1, x²/x or x³/x²)
    dens = jnp.stack([v[..., 9], v[..., 7], v[..., 4]], axis=-1)
    nums_x = jnp.stack([v[..., 7], v[..., 4], v[..., 0]], axis=-1)
    nums_y = jnp.stack([v[..., 8], v[..., 5], v[..., 1]], axis=-1)
    pick = jnp.argmax(jnp.abs(dens), axis=-1)[..., None]
    den = jnp.take_along_axis(dens, pick, axis=-1)[..., 0]
    den = jnp.where(jnp.abs(den) < _EPS, _EPS, den)
    x = jnp.take_along_axis(nums_x, pick, axis=-1)[..., 0] / den
    y = jnp.take_along_axis(nums_y, pick, axis=-1)[..., 0] / den

    # --- Gauss-Newton polish of (x, y, z) on the 10 cubic constraints.
    # Everything above runs in f32; the nullspace/eigh chain leaves errors
    # up to ~1e-1 on hard samples (f64 reference recovers 1e-7). A few GN
    # steps on r(p) = C · mono3(p) restore the f32 noise floor.
    def mono3(p):
        x_, y_, z_ = p[0], p[1], p[2]
        return jnp.stack([
            x_**3, x_**2 * y_, x_**2 * z_, x_ * y_**2, x_ * y_ * z_,
            x_ * z_**2, y_**3, y_**2 * z_, y_ * z_**2, z_**3,
            x_**2, x_ * y_, x_ * z_, y_**2, y_ * z_, z_**2,
            x_, y_, z_, jnp.ones_like(x_)])

    def gn_polish(C_h, p0):
        def resid(p):
            return C_h @ mono3(p)

        def step(p, _):
            r = resid(p)
            J = jax.jacfwd(resid)(p)                          # [10,3]
            H = J.T @ J + 1e-8 * jnp.eye(3, dtype=p.dtype)
            d = -jnp.linalg.solve(H, J.T @ r)
            p_new = p + d
            better = jnp.sum(resid(p_new) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, p_new, p), None

        p, _ = jax.lax.scan(step, p0, None, length=4)
        return p

    p0 = jnp.stack([x, y, z_root], axis=-1)                   # [B,R,3]
    p = jax.vmap(jax.vmap(gn_polish, in_axes=(None, 0)))(C, p0)
    x, y, z_root = p[..., 0], p[..., 1], p[..., 2]

    # --- reassemble E and project to the essential manifold
    coef = jnp.stack([x, y, z_root, jnp.ones_like(x)], axis=-1)  # [B,R,4]
    E = jnp.einsum("bnk,brk->brn", basis, coef).reshape(
        B, _MAX_ROOTS, 3, 3)
    nrm = jnp.sqrt(jnp.sum(E * E, axis=(-2, -1), keepdims=True)) + _EPS
    E = E / nrm
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[..., 0] + s[..., 1]) * 0.5
    S = jnp.stack([sm, sm, jnp.zeros_like(sm)], axis=-1)
    E = (U * S[..., None, :]) @ Vt

    ok = ok & jnp.isfinite(E).all(axis=(-2, -1)) & jnp.isfinite(x) \
        & jnp.isfinite(y)
    return E, ok
