"""Pose-graph optimization: the functional compute core.

Rebuild of the reference back-end (``back-end/graph.{hpp,cpp}``): a graph of
SE3 pose nodes, SE3-with-covariance ``BetweenFactor`` edges, one tightly
anchored origin node, optimized by Levenberg-Marquardt (the reference
delegates to gtsam, ``graph.cpp:227-266``).

TPU-native shape: fixed-capacity node/edge arrays with validity masks; edge
residuals ``ln(rel^-1 . (T_src^-1 . T_dst))`` for all edges at once; exact
per-edge Jacobians by forward-mode autodiff (vmapped ``jacfwd`` of the
residual at zero tangent — no hand-derived right-Jacobian approximations);
the normal equations scatter-added into a dense 6N x 6N system solved by
Cholesky. Dense is right for the reference's scale (tens-to-hundreds of
keyframes); the distributed path shards the keyframe sequence instead
(``mvslam_tpu.parallel``).

The host-side ``Graph`` / ``GraphOptimizer`` API wrapper lives in
``mvslam_tpu.backend.graph``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import SE3

Array = jax.Array

#: reference origin-anchor prior (back-end/graph.cpp:77,100-112)
ORIGIN_STDDEV = 1e-4


class PoseGraphData(NamedTuple):
    """Fixed-capacity pose graph. N nodes, E edges.

    ``edge_src``/``edge_dst`` index into the node arrays;
    ``edge_rel`` is the measured ``T_dst`` in ``src`` coordinates;
    ``edge_info`` the 6x6 information (inverse covariance) of that
    measurement. ``prior_info`` anchors nodes (row 0 = the origin anchor,
    reference ``graph.cpp:100-112``).
    """

    poses: SE3               # (N,)
    node_mask: Array         # (N,) bool
    edge_src: Array          # (E,) int32
    edge_dst: Array          # (E,) int32
    edge_rel: SE3            # (E,)
    edge_info: Array         # (E, 6, 6)
    edge_mask: Array         # (E,) bool
    prior_pose: SE3          # (N,)
    prior_info: Array        # (N, 6, 6)


class PoseGraphParams(NamedTuple):
    max_iterations: int = 100
    lambda_init: float = 1e-6
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-12
    lambda_max: float = 1e10
    rel_decrease: float = 1e-12


class PoseGraphResult(NamedTuple):
    poses: SE3
    error: Array
    iterations: Array
    converged: Array


def _edge_residual(Ts: SE3, Td: SE3, rel: SE3) -> Array:
    """``ln(rel^-1 . Ts^-1 . Td)`` — zero when the edge is satisfied."""
    return rel.inverse().compose(Ts.inverse().compose(Td)).log()


def _edge_residuals_and_jacobians(data: PoseGraphData):
    """All edge residuals + exact Jacobians wrt (delta_src, delta_dst).

    Right perturbation ``T <- T exp(delta)``. Returns
    r (E, 6), Js (E, 6, 6), Jd (E, 6, 6) — unweighted.
    """
    Ts = SE3(data.poses.R[data.edge_src], data.poses.t[data.edge_src])
    Td = SE3(data.poses.R[data.edge_dst], data.poses.t[data.edge_dst])

    def res(delta, Ts_R, Ts_t, Td_R, Td_t, rel_R, rel_t):
        ds, dd = delta[:6], delta[6:]
        Ts_p = SE3(Ts_R, Ts_t).compose(SE3.exp(ds))
        Td_p = SE3(Td_R, Td_t).compose(SE3.exp(dd))
        return _edge_residual(Ts_p, Td_p, SE3(rel_R, rel_t))

    zero = jnp.zeros((12,), data.poses.t.dtype)
    r = jax.vmap(res, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        zero, Ts.R, Ts.t, Td.R, Td.t, data.edge_rel.R, data.edge_rel.t
    )
    J = jax.vmap(
        jax.jacfwd(res), in_axes=(None, 0, 0, 0, 0, 0, 0)
    )(zero, Ts.R, Ts.t, Td.R, Td.t, data.edge_rel.R, data.edge_rel.t)
    return r, J[..., :6], J[..., 6:]


def _prior_residuals(data: PoseGraphData) -> Array:
    """``ln(prior^-1 . T)`` per node, identity Jacobian approximation
    (priors live at/near their means — they gauge-fix, reference
    ``graph.cpp:100-112``)."""
    return data.prior_pose.inverse().compose(data.poses).log()


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def pose_graph_cost(data: PoseGraphData, axis_name: str | None = None) -> Array:
    """Total cost; under shard_map with edge-sharded data the edge term is a
    local sum psum'd over the mesh, priors (replicated) added once."""
    r, _, _ = _edge_residuals_and_jacobians(data)
    w = data.edge_mask.astype(r.dtype)
    c_edges = 0.5 * jnp.sum(
        w * jnp.einsum("ei,eij,ej->e", r, data.edge_info, r)
    )
    rp = _prior_residuals(data)
    c_prior = 0.5 * jnp.sum(jnp.einsum("ni,nij,nj->n", rp, data.prior_info, rp))
    return _psum(c_edges, axis_name) + c_prior


def _normal_equations(data: PoseGraphData, axis_name: str | None = None):
    """Dense 6N x 6N H and 6N b by scatter-add over (possibly sharded)
    edges; the assembled system is psum'd so every shard solves the same
    replicated system (nodes are replicated; edges shard)."""
    N = data.poses.t.shape[0]
    dtype = data.poses.t.dtype
    r, Js, Jd = _edge_residuals_and_jacobians(data)
    w = data.edge_mask.astype(dtype)
    L = data.edge_info * w[:, None, None]           # masked info
    # per-edge blocks
    JsTL = jnp.einsum("eki,ekl->eil", Js, L)
    JdTL = jnp.einsum("eki,ekl->eil", Jd, L)
    Hss = JsTL @ Js
    Hsd = JsTL @ Jd
    Hdd = JdTL @ Jd
    bs = -jnp.einsum("eil,el->ei", JsTL, r)
    bd = -jnp.einsum("eil,el->ei", JdTL, r)
    H = jnp.zeros((N, N, 6, 6), dtype)
    H = H.at[data.edge_src, data.edge_src].add(Hss)
    H = H.at[data.edge_src, data.edge_dst].add(Hsd)
    H = H.at[data.edge_dst, data.edge_src].add(jnp.swapaxes(Hsd, -1, -2))
    H = H.at[data.edge_dst, data.edge_dst].add(Hdd)
    b = jnp.zeros((N, 6), dtype)
    b = b.at[data.edge_src].add(bs)
    b = b.at[data.edge_dst].add(bd)
    H = _psum(H, axis_name)
    b = _psum(b, axis_name)
    # priors (identity Jacobian)
    rp = _prior_residuals(data)
    H = H.at[jnp.arange(N), jnp.arange(N)].add(data.prior_info)
    b = b - jnp.einsum("nij,nj->ni", data.prior_info, rp)
    # masked-out nodes: pin with identity so the dense system stays SPD
    pin = jnp.where(data.node_mask, 0.0, 1.0).astype(dtype)
    H = H.at[jnp.arange(N), jnp.arange(N)].add(
        pin[:, None, None] * jnp.eye(6, dtype=dtype)
    )
    return H, b


def pose_graph_optimize(
    data: PoseGraphData,
    params: PoseGraphParams = PoseGraphParams(),
    axis_name: str | None = None,
) -> PoseGraphResult:
    """LM over the whole graph (reference ``GraphOptimizer::optimize``,
    ``back-end/graph.cpp:254-258``).

    ``axis_name``: under ``shard_map`` with edges sharded over that mesh
    axis (nodes/priors replicated), the identical code runs distributed —
    one psum of the dense (N, N, 6, 6) system per iteration.
    """
    N = data.poses.t.shape[0]
    dtype = data.poses.t.dtype
    eye = jnp.eye(6 * N, dtype=dtype)

    def with_poses(poses: SE3) -> PoseGraphData:
        return data._replace(poses=poses)

    def lm_step(state):
        R, t, lam, cost, it, done = state
        poses = SE3(R, t)
        H, b = _normal_equations(with_poses(poses), axis_name)
        H_flat = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        delta = linalg.solve_psd(H_flat + lam * eye, b.reshape(-1))
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0).reshape(N, 6)
        delta = delta * data.node_mask[:, None]
        new_poses = poses.compose(SE3.exp(delta))
        new_cost = pose_graph_cost(with_poses(new_poses), axis_name)
        accept = jnp.logical_and(jnp.isfinite(new_cost), new_cost < cost)
        lam = jnp.clip(
            jnp.where(accept, lam * params.lambda_down, lam * params.lambda_up),
            params.lambda_min, params.lambda_max,
        )
        R = jnp.where(accept, new_poses.R, R)
        t = jnp.where(accept, new_poses.t, t)
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        thresh = jnp.maximum(
            params.rel_decrease * cost, 10.0 * eps * (1.0 + cost)
        )
        converged = jnp.logical_and(
            jnp.isfinite(new_cost), jnp.abs(cost - new_cost) < thresh
        )
        cost = jnp.where(accept, new_cost, cost)
        return R, t, lam, cost, it + 1, converged

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < params.max_iterations, jnp.logical_not(done))

    cost0 = pose_graph_cost(data, axis_name)
    state0 = (
        data.poses.R, data.poses.t,
        jnp.asarray(params.lambda_init, dtype), cost0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    R, t, lam, cost, it, done = jax.lax.while_loop(cond, lm_step, state0)
    return PoseGraphResult(
        poses=SE3(R, t), error=cost, iterations=it, converged=done
    )
