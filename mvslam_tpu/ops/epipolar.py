"""Epipolar geometry: Hartley-normalized 8-point solves for F and E.

Rebuild of the reference ``source/vision/fundamental-matrix.{hpp,cpp}`` and the
essential-matrix half of ``source/vision/sfm-solve.cpp`` — but batched: every
routine accepts a leading hypothesis axis so a whole RANSAC batch is one
fused XLA computation instead of the reference's per-iteration loop
(``vision/estimator-RANSAC.cpp:16-90``).

Point sets are fixed-capacity ``(N, 2|3)`` arrays with a boolean/float mask;
masked-out rows contribute zero rows to the DLT system, which leaves the
normal equations unchanged — the TPU-native replacement for dynamic point
counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3, skew, so3_exp

Array = jax.Array


def normalization_transform(points: Array, weights: Array) -> Array:
    """Hartley conditioning transform for a weighted 2D point set.

    Translates the (weighted) centroid to the origin and scales the mean
    distance-from-centroid to sqrt(2) (reference
    ``find_normalization_transform``, ``vision/fundamental-matrix.cpp:18-54``).

    points: (..., N, 2); weights: (..., N) zero/one mask (or soft weights).
    Returns (..., 3, 3) homogeneous transforms.
    """
    dtype = points.dtype
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    wsum = jnp.maximum(wsum, jnp.asarray(1.0, dtype))
    centroid = jnp.sum(points * weights[..., None], axis=-2) / wsum
    d = jnp.linalg.norm(points - centroid[..., None, :], axis=-1)
    mean_dist = jnp.sum(d * weights, axis=-1) / wsum[..., 0]
    scale = jnp.sqrt(jnp.asarray(2.0, dtype)) / jnp.maximum(
        mean_dist, jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    )
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, zeros, -scale * centroid[..., 0]], axis=-1),
            jnp.stack([zeros, scale, -scale * centroid[..., 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return T


def _dlt_rows(p1: Array, p2: Array) -> Array:
    """Epipolar constraint rows: ``p2^T F p1 = 0`` with p = (x, y, 1).

    p1, p2: (..., N, 2) -> (..., N, 9) rows
    [x2 x1, x2 y1, x2, y2 x1, y2 y1, y2, x1, y1, 1]
    (reference ``vision/fundamental-matrix.cpp:96-117``).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def _det3(M: Array) -> Array:
    """Closed-form 3x3 determinant, batched."""
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _cubic_roots_real(c3: Array, c2: Array, c1: Array, c0: Array) -> Array:
    """Real roots of ``c3 t^3 + c2 t^2 + c1 t + c0``, batched -> (..., 3).

    Trigonometric method for three real roots, Cardano for one; when fewer
    than three real roots exist the extras duplicate a real root (harmless:
    downstream scoring picks the best candidate). Near-quadratic leading
    coefficients are guarded by normalizing with a clamped |c3|.
    """
    dtype = c3.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    c3_safe = jnp.where(jnp.abs(c3) < tiny, tiny, c3)
    a = c2 / c3_safe
    b = c1 / c3_safe
    c = c0 / c3_safe
    # depressed cubic s^3 + p s + q, t = s - a/3
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + c
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3  # <0: three real roots
    # --- three-real-root branch (trigonometric) ---
    p_neg = jnp.minimum(p, -tiny)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    phi = jnp.arccos(arg)
    k = jnp.arange(3, dtype=dtype)
    s_tri = m[..., None] * jnp.cos(
        (phi[..., None] - 2.0 * jnp.pi * k) / 3.0
    )
    # --- one-real-root branch (Cardano) ---
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_car = jnp.cbrt(-q / 2.0 + sq) + jnp.cbrt(-q / 2.0 - sq)
    s = jnp.where(disc[..., None] < 0, s_tri, s_car[..., None])
    return s - a[..., None] / 3.0


def _solve_epipolar_span(p1: Array, p2: Array, weights: Array,
                         use_eigh: bool = False) -> tuple[Array, Array]:
    """Two smallest-eigenvalue DLT solutions, (..., 3, 3) each.

    A minimal (8-point) or degenerate point set leaves the epipolar DLT with
    a >=2-dimensional null space (the reference's cube rig is such a case);
    both basis vectors are needed to pin down the true matrix.

    ``use_eigh`` selects exact ``jnp.linalg.eigh`` extraction: on
    well-separated spectra (overdetermined all-inlier refits) the amplified
    extractor's second vector degrades toward an arbitrary direction,
    costing ~30% max-element accuracy on noisy fits (r4 advisor A/B:
    0.058 vs 0.045). Use it for one-shot/non-batched solves; the
    per-hypothesis RANSAC batch keeps the amplified chain (batched eigh
    cost 3.4 ms per 256-hypothesis batch on the tunneled v5e).
    """
    A = _dlt_rows(p1, p2) * weights[..., None]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    if use_eigh:
        _, V = jnp.linalg.eigh(AtA)           # ascending eigenvalues
        v1 = V[..., :, 0]
        v2 = V[..., :, 1]
    else:
        v1, v2 = linalg.smallest_eigvecs2_psd(AtA)
    e1 = v1.reshape(AtA.shape[:-2] + (3, 3))
    e2 = v2.reshape(AtA.shape[:-2] + (3, 3))
    return e1, e2


def _span_candidates(E1: Array, E2: Array) -> Array:
    """Rank-deficient candidates ``E1 + t E2`` from the DLT null span.

    Solves ``det(E1 + t E2) = 0`` — a cubic in t with coefficients fitted
    from four determinant evaluations (the 7-point-algorithm trick, H&Z
    §11.1.2) — and stacks the three roots plus the raw basis vectors:
    (..., 5, 3, 3). Candidates are Frobenius-normalized.
    """
    d0 = _det3(E1)
    d1 = _det3(E1 + E2)
    dm1 = _det3(E1 - E2)
    d2 = _det3(E1 + 2.0 * E2)
    c0 = d0
    c2 = 0.5 * (d1 + dm1) - c0
    half_odd = 0.5 * (d1 - dm1)          # c1 + c3
    c3 = ((d2 - c0 - 4.0 * c2) * 0.5 - half_odd) / 3.0
    c1 = half_odd - c3
    ts = _cubic_roots_real(c3, c2, c1, c0)  # (..., 3)
    cands = E1[..., None, :, :] + ts[..., :, None, None] * E2[..., None, :, :]
    cands = jnp.concatenate(
        [cands, E1[..., None, :, :], E2[..., None, :, :]], axis=-3
    )
    norm = jnp.linalg.norm(cands, axis=(-2, -1), keepdims=True)
    return cands / jnp.maximum(norm, jnp.finfo(E1.dtype).tiny)


def _apply_transform2d(T: Array, p: Array) -> Array:
    """Apply homogeneous 3x3 to 2D points (..., N, 2)."""
    return (
        jnp.einsum("...ij,...nj->...ni", T[..., :2, :2], p)
        + T[..., None, :2, 2]
    )


def _project_rank2(F: Array) -> Array:
    """Zero the smallest singular value (fundamental-matrix structure,
    reference ``vision/fundamental-matrix.cpp:128-136``). Closed-form
    3x3 SVD — iterative ``jnp.linalg.svd`` on the (H, 5, 3, 3) candidate
    batch cost 8.6 ms per RANSAC solve on the tunneled v5e."""
    U, s, Vt = linalg.svd3x3(F)
    s = s.at[..., 2].set(0.0)
    return (U * s[..., None, :]) @ Vt


def _project_essential(E: Array) -> Array:
    """Impose two equal singular values and a zero third:
    ``E = U diag(s, s, 0) V^T``, ``s = (s1 + s2) / 2`` (reference
    ``find_essential_matrix``, ``vision/sfm-solve.cpp:62-90``). Closed-
    form 3x3 SVD (see :func:`_project_rank2`)."""
    U, s, Vt = linalg.svd3x3(E)
    s_mean = 0.5 * (s[..., 0] + s[..., 1])
    s_new = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
    return (U * s_new[..., None, :]) @ Vt


def _pick_best(cands: Array, err: Array, weights: Array) -> Array:
    """cands: (..., C, 3, 3); err: (..., C, N) -> best candidate by weighted
    residual sum."""
    total = jnp.sum(err * weights[..., None, :], axis=-1)  # (..., C)
    best = jnp.argmin(total, axis=-1)
    return jnp.take_along_axis(
        cands, best[..., None, None, None], axis=-3
    )[..., 0, :, :]


def find_fundamental_matrix(p1: Array, p2: Array, weights: Array,
                            use_eigh: bool = False) -> Array:
    """Hartley-normalized fundamental matrix, batched, degeneracy-robust.

    Rebuild of ``find_fundamental_matrix_8point``
    (``vision/fundamental-matrix.cpp:56-140``) with one structural upgrade:
    instead of taking only the smallest right singular vector of the DLT —
    which is arbitrary when the point set is minimal or degenerate — the
    two-vector null span is searched for the rank-deficient members
    (det = 0 cubic, as in the 7-point algorithm) and the candidate with the
    lowest weighted epipolar residual wins. Conditioning, rank-2 structure,
    and ``T2^T F' T1`` denormalization follow the reference.

    p1, p2: (..., N, 2) pixel coords; weights: (..., N). Returns (..., 3, 3)
    with ``|F|_F = 1``. ``use_eigh``: see :func:`_solve_epipolar_span`.
    """
    T1 = normalization_transform(p1, weights)
    T2 = normalization_transform(p2, weights)
    q1 = _apply_transform2d(T1, p1)
    q2 = _apply_transform2d(T2, p2)
    F1, F2 = _solve_epipolar_span(q1, q2, weights, use_eigh=use_eigh)
    cands = _span_candidates(F1, F2)                      # (..., 5, 3, 3)
    cands = _project_rank2(cands)
    cands = jnp.swapaxes(T2, -1, -2)[..., None, :, :] @ cands @ T1[..., None, :, :]
    norm = jnp.linalg.norm(cands, axis=(-2, -1), keepdims=True)
    cands = cands / jnp.maximum(norm, jnp.finfo(p1.dtype).tiny)
    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    err = sampson_error(cands, h1[..., None, :, :], h2[..., None, :, :])
    return _pick_best(cands, err, weights)


def find_essential_matrix(r1: Array, r2: Array, weights: Array,
                          use_eigh: bool = False) -> Array:
    """Essential matrix from *ideal-camera* rays, batched, degeneracy-robust.

    Same null-span + det-cubic search as :func:`find_fundamental_matrix`
    (ideal coordinates are already conditioned, so no Hartley transform),
    with the essential structure imposed on every candidate before scoring.
    Handles the reference's own cube rig, which is degenerate for the plain
    8-point solve (2-dimensional DLT null space) — the reference leans on
    OpenCV's 5-point solver there (``vision/sfm-solve.cpp:51-60``).

    r1, r2: (..., N, 3) homogeneous rays with last coord 1 (or (..., N, 2)).
    Returns (..., 3, 3) with ``|E|_F = 1``.
    """
    p1 = r1[..., :2]
    p2 = r2[..., :2]
    E1, E2 = _solve_epipolar_span(p1, p2, weights, use_eigh=use_eigh)
    cands = _span_candidates(E1, E2)                      # (..., 5, 3, 3)
    cands = _project_essential(cands)
    ones = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    err = sampson_error(cands, h1[..., None, :, :], h2[..., None, :, :])
    return _pick_best(cands, err, weights)


def epipolar_residual(E: Array, r1: Array, r2: Array) -> Array:
    """Algebraic epipolar residual ``|r2^T E r1|`` per point.

    The reference's inlier statistic (``estimator-RANSAC.cpp:100-129``).
    E: (..., 3, 3); r1, r2: (..., N, 3) -> (..., N).
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, r1)
    return jnp.abs(jnp.sum(r2 * Er1, axis=-1))


def sampson_error(E: Array, r1: Array, r2: Array) -> Array:
    """First-order geometric (Sampson) error per point, (..., N).

    More selective than the algebraic residual for RANSAC scoring; this is
    what OpenCV's ``findEssentialMat`` thresholds internally (the reference
    delegates to it, ``vision/sfm-solve.cpp:51-60``).
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, r1)
    Etr2 = jnp.einsum("...ji,...nj->...ni", E, r2)
    num = jnp.sum(r2 * Er1, axis=-1) ** 2
    den = (
        Er1[..., 0] ** 2 + Er1[..., 1] ** 2
        + Etr2[..., 0] ** 2 + Etr2[..., 1] ** 2
    )
    return num / jnp.maximum(den, jnp.finfo(E.dtype).tiny)


def sampson_weights(E: Array, r1: Array, r2: Array) -> Array:
    """Inverse Sampson denominators ``1 / d_i`` per point, (..., N).

    Weighting DLT row i by ``sqrt(1/d_i)`` makes the algebraic least squares
    minimize the (first-order) geometric Sampson cost — the IRLS trick that
    removes most of the 8-point algorithm's noise bias.
    """
    Er1 = jnp.einsum("...ij,...nj->...ni", E, r1)
    Etr2 = jnp.einsum("...ji,...nj->...ni", E, r2)
    den = (
        Er1[..., 0] ** 2 + Er1[..., 1] ** 2
        + Etr2[..., 0] ** 2 + Etr2[..., 1] ** 2
    )
    floor = jnp.asarray(jnp.finfo(E.dtype).eps, E.dtype)
    return 1.0 / jnp.maximum(den, floor)


def essential_from_pose(pose2in1: SE3) -> Array:
    """E (unit Frobenius norm) from the relative camera pose ``pose2in1``."""
    T21 = pose2in1.inverse()
    E = skew(T21.t) @ T21.R
    norm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    return E / jnp.maximum(norm, jnp.finfo(E.dtype).tiny)


def refine_relative_pose_sampson(
    pose2in1: SE3, r1: Array, r2: Array, weights: Array, iterations: int = 6
) -> SE3:
    """Gauss-Newton on the Sampson cost over the 5-dof relative pose.

    The minimal-parameter gold standard short of full two-view BA: rotation
    perturbed in so(3), translation direction on the unit sphere (2 dof via
    a tangent basis). Removes the bias of the algebraic 8-point/RANSAC
    estimate (an E-manifold projection is not a geometric minimizer). Exact
    Jacobians by forward-mode autodiff; fixed iteration count with a
    cost-decrease guard per step; jit-safe.

    Returns the refined pose with ``|t| = 1``.
    """
    dtype = r1.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)

    def apply_params(params, R, t):
        """(R21, t21) perturbed by 3 rotation + 2 sphere-tangent params."""
        dr, dt = params[:3], params[3:]
        Rn = R @ so3_exp(dr)
        ref = jnp.where(
            jnp.abs(t[0]) < 0.9,
            jnp.asarray([1.0, 0.0, 0.0], dtype),
            jnp.asarray([0.0, 1.0, 0.0], dtype),
        )
        b1 = jnp.cross(t, ref)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), tiny)
        b2 = jnp.cross(t, b1)
        tn = t + b1 * dt[0] + b2 * dt[1]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), tiny)
        return Rn, tn

    def signed_sampson(params, R, t):
        Rn, tn = apply_params(params, R, t)
        E = skew(tn) @ Rn                      # E for world-to-cam-2 (R, t)
        E = E / jnp.maximum(jnp.linalg.norm(E), tiny)
        Er1 = r1 @ E.T
        Etr2 = r2 @ E
        a = jnp.sum(r2 * Er1, axis=-1)
        d = (
            Er1[..., 0] ** 2 + Er1[..., 1] ** 2
            + Etr2[..., 0] ** 2 + Etr2[..., 1] ** 2
        )
        return a / jnp.sqrt(jnp.maximum(d, tiny)) * weights

    def step(_, Rt):
        R, t = Rt
        zero = jnp.zeros((5,), dtype)
        res = signed_sampson(zero, R, t)
        J = jax.jacfwd(signed_sampson)(zero, R, t)      # (N, 5)
        H = J.T @ J
        g = -J.T @ res
        jitter = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
            1.0 + jnp.max(jnp.abs(H))
        )
        delta = jnp.linalg.solve(H + jitter * jnp.eye(5, dtype=dtype), g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        new_cost = jnp.sum(signed_sampson(delta, R, t) ** 2)
        ok = new_cost < jnp.sum(res**2)
        return apply_params(jnp.where(ok, delta, jnp.zeros_like(delta)), R, t)

    # pose is camera-2-in-frame-1; the E parametrization works on the
    # world-to-camera transform (R21, t21)
    T21 = pose2in1.inverse()
    R, t = jax.lax.fori_loop(0, iterations, step, (T21.R, T21.t))
    return SE3(R, t).inverse()


def decompose_essential_matrix(E: Array) -> tuple[Array, Array]:
    """E -> 4 candidate (R, t) with ``|t| = 1`` (H&Z p258; reference
    ``decompose_essential_matrix``, ``vision/sfm-solve.cpp:97-127``).

    Returns (Rs, ts): (..., 4, 3, 3) and (..., 4, 3). Candidates are
    (R1, +t), (R1, -t), (R2, +t), (R2, -t) with ``R1 = U W V^T``,
    ``R2 = U W^T V^T`` made proper rotations.
    """
    U, _, Vt = linalg.svd3x3(E)
    dtype = E.dtype
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype)
    # make U, V proper rotations so R below is a rotation
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)[..., None, None]
    R1 = U @ W @ Vt
    R2 = U @ jnp.swapaxes(W, -1, -2) @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts
