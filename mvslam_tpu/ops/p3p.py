"""P3P: camera pose from three 3D-2D correspondences (Grunert closed form).

The reference gets planar-safe minimal pose estimation from OpenCV's P3P
inside ``cv::solvePnPRansac`` (``vision/pnp-solve.cpp:43-49``). A linear
6-point DLT degenerates on (quasi-)planar scenes — the dominant indoor
geometry — so the TPU-native build needs a real minimal solver too.

Design: fully batched, branch-free Grunert P3P. The depth-ratio quartic is
*constructed symbolically in code* (tiny static polynomial convolutions over
batched scalars — no transcribed coefficient formulas to get wrong), solved
in closed form (Ferrari, pure REAL arithmetic — the axon TPU platform has
no complex lowering), then each root is polished with a few real Newton
steps and each depth triple with a 3x3 Newton on the law-of-cosines system
to recover f32 accuracy. Rotation recovery avoids SVD entirely: with exact
pairwise distances enforced by the depths, the rigid transform maps the
world orthonormal triad onto the camera triad, so ``R = Bc @ Bw^T`` in
closed form.

Everything is vmapped over hypothesis batches by construction: per-batch
cost is scalar algebra plus two 3x3 matmuls — far cheaper than the 12x12
eigen-iteration of the DLT path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.math.linalg import inv3x3

Array = jax.Array


def _polymul(a: tuple, b: tuple) -> tuple:
    """Multiply two polynomials given as ascending coefficient tuples of
    batched scalars (static shapes; unrolled at trace time)."""
    out = [0.0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = out[i + j] + ai * bj
    return tuple(out)


def _polysub(a: tuple, b: tuple) -> tuple:
    n = max(len(a), len(b))
    a = a + (0.0,) * (n - len(a))
    b = b + (0.0,) * (n - len(b))
    return tuple(ai - bi for ai, bi in zip(a, b))


def _polyscale(a: tuple, s) -> tuple:
    return tuple(ai * s for ai in a)


def _cbrt(x):
    """Real cube root, sign-preserving (TPU-safe: no complex)."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _quartic_roots(c0, c1, c2, c3, c4):
    """Four real root *candidates* of ``c4 v^4 + ... + c0`` — Ferrari with
    pure REAL arithmetic, batched over the leading dims.

    The 'axon' TPU platform has no complex lowering, so the classic
    complex-valued Ferrari is off the table. Instead: the resolvent cubic
    is solved with the Cardano/trigonometric split (both real-only), the
    factorization quadratics take clamped-discriminant roots, and genuinely
    complex root pairs surface as duplicated/near-root real candidates.
    That is exactly what the caller wants anyway: every candidate is
    Newton-polished against the true quartic and then against the
    law-of-cosines depth system, and non-roots are rejected by residual —
    so candidate *recall* matters, candidate precision does not. Returns
    (..., 4) real candidates.
    """
    dtype = c0.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    lead = jnp.where(jnp.abs(c4) > tiny, c4, tiny)
    a = c3 / lead
    b = c2 / lead
    c = c1 / lead
    d = c0 / lead
    # depressed quartic y^4 + P y^2 + Q y + R with v = y - a/4
    P = b - 3.0 * a * a / 8.0
    Q = c - a * b / 2.0 + a * a * a / 8.0
    R = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * (a ** 4) / 256.0
    # resolvent cubic z^3 - P z^2 - 4 R z + (4 P R - Q^2) = 0; we need its
    # LARGEST real root (guarantees z0 >= P, i.e. s^2 >= 0, when the
    # factorization into real quadratics exists)
    B2 = -P
    B1 = -4.0 * R
    B0 = 4.0 * P * R - Q * Q
    p3 = B1 - B2 * B2 / 3.0
    q3 = 2.0 * (B2 ** 3) / 27.0 - B2 * B1 / 3.0 + B0
    disc = (q3 / 2.0) ** 2 + (p3 / 3.0) ** 3
    # disc >= 0: one real root, Cardano with real cube roots
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    w_card = _cbrt(-q3 / 2.0 + sq) + _cbrt(-q3 / 2.0 - sq)
    # disc < 0 (casus irreducibilis): three real roots; largest via arccos
    m = 2.0 * jnp.sqrt(jnp.maximum(-p3 / 3.0, tiny))
    # trig branch only applies for p3 < 0 (disc < 0 implies it), so the
    # denominator is negative; bound it away from zero
    cos_arg = jnp.clip(3.0 * q3 / jnp.minimum(p3 * m, -tiny), -1.0, 1.0)
    # for p3 < 0: w_max = m * cos(arccos(3 q3 / (p3 m)) / 3)
    w_trig = m * jnp.cos(jnp.arccos(cos_arg) / 3.0)
    w = jnp.where(disc >= 0, w_card, w_trig)
    z0 = w - B2 / 3.0
    s = jnp.sqrt(jnp.maximum(z0 - P, 0.0))
    s_safe = jnp.maximum(s, tiny)
    # y^4+Py^2+Qy+R = (y^2 + s y + t1)(y^2 - s y + t2),
    # t1 = (z0 - Q/s)/2, t2 = (z0 + Q/s)/2
    t1 = (z0 - Q / s_safe) / 2.0
    t2 = (z0 + Q / s_safe) / 2.0
    d1 = jnp.sqrt(jnp.maximum(s * s - 4.0 * t1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(s * s - 4.0 * t2, 0.0))
    y = jnp.stack(
        [(-s + d1) / 2.0, (-s - d1) / 2.0, (s + d2) / 2.0, (s - d2) / 2.0],
        axis=-1,
    )
    return y - a[..., None] / 4.0


def _newton_polish(v, coeffs, iterations: int = 8):
    """Real Newton refinement of quartic roots (guarded derivative)."""
    c0, c1, c2, c3, c4 = coeffs
    dtype = c0.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)

    def f(x):
        return (((c4[..., None] * x + c3[..., None]) * x + c2[..., None])
                * x + c1[..., None]) * x + c0[..., None]

    def df(x):
        return ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
                + 2.0 * c2[..., None]) * x + c1[..., None]

    for _ in range(iterations):
        g = df(v)
        g = jnp.where(jnp.abs(g) > tiny, g, tiny)
        step = f(v) / g
        # damp huge steps (near-double roots)
        step = jnp.clip(step, -1.0, 1.0)
        v = v - step
    return v


def _triad(p0: Array, p1: Array, p2: Array) -> Array:
    """Right-handed orthonormal basis (..., 3, 3) columns from 3 points."""
    dtype = p0.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    e1 = p1 - p0
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), tiny)
    d2 = p2 - p0
    e2 = d2 - jnp.sum(d2 * e1, axis=-1, keepdims=True) * e1
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2, axis=-1, keepdims=True), tiny)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def p3p_solve(X: Array, f: Array) -> tuple[SE3, Array]:
    """Camera pose candidates from 3 world points and 3 unit bearings.

    X: (..., 3, 3) world points; f: (..., 3, 3) unit bearing vectors in the
    camera frame (rows index the 3 correspondences). Returns candidate
    camera-to-world poses as an SE3 with batch shape (..., 12) — 4 quartic
    roots x 3 depth-ratio extractions, each Newton-polished to a true
    solution or rejected — plus a (..., 12) validity mask. Invalid
    candidates are identity poses. (The <=4 geometric solutions appear
    possibly duplicated; RANSAC scoring downstream is duplicate-agnostic.)

    Reference behavior anchor: ``cv::solvePnPRansac(P3P)`` used at
    ``vision/pnp-solve.cpp:43-49``.
    """
    dtype = X.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    eps = jnp.finfo(dtype).eps

    P1, P2, P3 = X[..., 0, :], X[..., 1, :], X[..., 2, :]
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    p = 2.0 * jnp.sum(f2 * f3, axis=-1)
    q = 2.0 * jnp.sum(f1 * f3, axis=-1)
    r = 2.0 * jnp.sum(f1 * f2, axis=-1)
    b2s = jnp.maximum(b2, tiny)
    ab = a2 / b2s
    cb = c2 / b2s

    one = jnp.ones_like(ab)
    # with u = s2/s1, v = s3/s1 and the three law-of-cosines constraints:
    #   L(v) = (1-ab) v^2 + ab q v - ab          (from eqs 1,2)
    #   K(v) = -cb v^2 + cb q v + (1-cb)         (from eqs 2,3)
    #   u = (L - K) / (p v - r); quartic: (L-K)^2 - r (L-K) G + K G^2 = 0
    L = (-ab, ab * q, one - ab)            # ascending coefficients
    K = (one - cb, cb * q, -cb)
    M = _polysub(L, K)
    G = (-r, p)
    quart = _polysub(
        _polymul(M, M),
        _polysub(_polyscale(_polymul(M, G), r),
                 _polymul(K, _polymul(G, G))),
    )
    coeffs = quart  # (c0..c4), each (...,)
    v = _quartic_roots(*coeffs)                           # (..., 4)
    v = _newton_polish(v, coeffs)
    # residual check: root must satisfy the quartic at working precision
    c0, c1, c2_, c3, c4 = coeffs
    resid = (((c4[..., None] * v + c3[..., None]) * v + c2_[..., None])
             * v + c1[..., None]) * v + c0[..., None]
    scale = sum(jnp.abs(c)[..., None] for c in coeffs) + tiny
    root_ok = jnp.abs(resid) < 1e3 * eps * scale * jnp.maximum(
        jnp.abs(v), 1.0) ** 4

    # recover u. The linear extraction u = (L-K)/(p v - r) is exact but
    # degenerates when p v - r ~ 0 (a common real geometry, not a corner
    # case), and the quadratic u^2 - r u + K(v) = 0 always yields two
    # candidates but cannot tell which branch is consistent. Rather than
    # guessing, carry ALL three u-candidates per root into the depth
    # Newton polish below: CANDS = 4 roots x 3 extractions = 12 candidate
    # depth triples per call, each polished to a true solution or rejected
    # by its constraint residual. Scalar algebra — still far cheaper than
    # one 12x12 DLT eigensolve.
    Lv = (L[2][..., None] * v + L[1][..., None]) * v + L[0][..., None]
    Kv = (K[2][..., None] * v + K[1][..., None]) * v + K[0][..., None]
    Gv = p[..., None] * v - r[..., None]
    u_lin = (Lv - Kv) / jnp.where(jnp.abs(Gv) > tiny, Gv, tiny)
    disc_u = jnp.maximum(r[..., None] ** 2 / 4.0 - Kv, 0.0)
    sq_u = jnp.sqrt(disc_u)
    u_qa = r[..., None] / 2.0 + sq_u
    u_qb = r[..., None] / 2.0 - sq_u
    u = jnp.stack([u_lin, u_qa, u_qb], axis=-1)             # (..., 4, 3)

    # depths: s1^2 = b2 / (1 + v^2 - q v)
    den = 1.0 + v * v - q[..., None] * v
    s1_root = jnp.sqrt(jnp.maximum(b2[..., None], 0.0)
                       / jnp.maximum(den, tiny))
    batch = v.shape[:-1]
    s1 = jnp.broadcast_to(s1_root[..., None], batch + (4, 3)).reshape(
        batch + (12,))
    s3 = jnp.broadcast_to((v * s1_root)[..., None], batch + (4, 3)).reshape(
        batch + (12,))
    s2 = (u * s1_root[..., None]).reshape(batch + (12,))
    valid = jnp.broadcast_to(
        (root_ok & (den > tiny))[..., None], batch + (4, 3)
    ).reshape(batch + (12,))
    s1 = jnp.where(jnp.isfinite(s1), s1, 1.0)
    s2 = jnp.where(jnp.isfinite(s2), s2, 1.0)
    s3 = jnp.where(jnp.isfinite(s3), s3, 1.0)

    # Newton-polish the depths on the original law-of-cosines constraints.
    # The quartic's coefficients already carry O(eps) rounding, and near
    # clustered roots that perturbs v by orders more — the 3 distance
    # equations in (s1, s2, s3) are the well-conditioned form, so a few
    # batched 3x3 Newton steps recover full working precision (critical for
    # the f32 TPU path).
    pq = p[..., None]
    qq = q[..., None]
    rq = r[..., None]
    a2q = a2[..., None]
    b2q = b2[..., None]
    c2q = c2[..., None]
    zero = jnp.zeros_like(s1)

    def constraints(s1, s2, s3):
        return jnp.stack(
            [s2 * s2 + s3 * s3 - pq * s2 * s3 - a2q,
             s1 * s1 + s3 * s3 - qq * s1 * s3 - b2q,
             s1 * s1 + s2 * s2 - rq * s1 * s2 - c2q],
            axis=-1,
        )

    for _ in range(8):
        g = constraints(s1, s2, s3)
        J = jnp.stack(
            [jnp.stack([zero, 2.0 * s2 - pq * s3, 2.0 * s3 - pq * s2],
                       axis=-1),
             jnp.stack([2.0 * s1 - qq * s3, zero, 2.0 * s3 - qq * s1],
                       axis=-1),
             jnp.stack([2.0 * s1 - rq * s2, 2.0 * s2 - rq * s1, zero],
                       axis=-1)],
            axis=-2,
        )
        delta = jnp.einsum("...ij,...j->...i", inv3x3(J), g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        cap = 0.5 * jnp.abs(s1[..., None])
        delta = jnp.clip(delta, -cap, cap)
        s1 = s1 - delta[..., 0]
        s2 = s2 - delta[..., 1]
        s3 = s3 - delta[..., 2]
    # authoritative validity: polished depths must satisfy the distance
    # constraints at working precision and be positive (cheirality)
    gfin = constraints(s1, s2, s3)
    cscale = (a2q + b2q + c2q) + tiny                       # (..., 1)
    depth_ok = jnp.max(jnp.abs(gfin), axis=-1) < 1e4 * eps * cscale
    valid = (valid & depth_ok & (s1 > tiny) & (s2 > tiny) & (s3 > tiny))

    # camera-frame points and closed-form triad alignment
    Yc = jnp.stack(
        [s1[..., None] * f1[..., None, :],
         s2[..., None] * f2[..., None, :],
         s3[..., None] * f3[..., None, :]],
        axis=-2,
    )                                                       # (..., 4, 3, 3)
    Bw = _triad(P1, P2, P3)                                 # (..., 3, 3)
    Bc = _triad(Yc[..., 0, :], Yc[..., 1, :], Yc[..., 2, :])  # (..., 4, 3, 3)
    R_wc = Bc @ jnp.swapaxes(Bw, -1, -2)[..., None, :, :]   # world->camera
    t_wc = Yc[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", R_wc, jnp.broadcast_to(P1[..., None, :],
                                                   Yc[..., 0, :].shape)
    )
    finite = jnp.all(jnp.isfinite(R_wc), axis=(-2, -1)) & jnp.all(
        jnp.isfinite(t_wc), axis=-1)
    valid = valid & finite
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R_wc.shape)
    R_wc = jnp.where(valid[..., None, None], R_wc, eyeR)
    t_wc = jnp.where(valid[..., None], t_wc, jnp.zeros_like(t_wc))
    # camera-to-world
    pose = SE3(R_wc, t_wc).inverse()
    return pose, valid
