"""Scale-drift-aware (Sim3) pose-graph optimization for monocular loops.

Monocular odometry drifts in SCALE as well as pose: on the synthetic
ellipse loop the second half's odometry edge lengths shrink to 0.89-0.95x
of truth. An SE3 pose graph cannot represent that — metric loop-closure
edges and scale-drifted odometry edges are mutually inconsistent, and LM
just trades endpoint error for mid-trajectory warp. The classic fix
(Strasdat et al., "Scale Drift-Aware Large Scale Monocular SLAM", RSS
2010 — PAPERS.md) optimizes over Sim3: each node carries (s, R, t), each
edge measures the relative similarity, and the loop's scale inconsistency
distributes smoothly around the cycle.

TPU-native shape, mirroring ``backend/pose_graph.py``: fixed-capacity
arrays, all-edge batched residuals, exact Jacobians by vmapped ``jacfwd``
of a 7-dof chart retraction (no hand-derived Sim3 right-Jacobians), dense
7N x 7N normal equations, LM with masked convergence, optional
``axis_name`` for edge-sharded execution under ``shard_map`` (one psum of
the assembled system per iteration).

The residual uses the chart ``(nu, omega, lambda)`` with retraction
``T . (nu, exp(omega), e^lambda)`` and error decomposition
``E = rel^-1 . Ti^-1 . Tj -> (t_E, ln R_E, ln s_E)`` — a local
diffeomorphism at identity (not the exact Sim3 Lie log; equivalent for
least squares near zero residual, and autodiff keeps the Jacobians exact
for whatever chart is chosen).

This module has NO reference counterpart — the reference's back-end is
SE3-only gtsam (``back-end/graph.cpp``) and was never wired to a tracker.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvslam_tpu.math import linalg
from mvslam_tpu.math.lie import so3_exp, so3_log

Array = jax.Array


class Sim3(NamedTuple):
    """Similarity transform ``x -> s R x + t`` (batched leaves allowed)."""

    s: Array                 # (...,)
    R: Array                 # (..., 3, 3)
    t: Array                 # (..., 3)

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            jnp.ones(shape, dtype),
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3)),
            jnp.zeros(shape + (3,), dtype),
        )

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.s * other.s,
            self.R @ other.R,
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R,
                                           other.t) + self.t,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        inv_s = 1.0 / self.s
        return Sim3(
            inv_s, Rt,
            -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t),
        )

    def apply(self, x: Array) -> Array:
        return (self.s[..., None]
                * jnp.einsum("...ij,...j->...i", self.R, x) + self.t)

    def retract(self, delta: Array) -> "Sim3":
        """Right-chart update: ``T . (nu, exp(omega), e^lambda)`` with
        ``delta = (nu[3], omega[3], lambda[1])``."""
        nu = delta[..., :3]
        omega = delta[..., 3:6]
        lam = delta[..., 6]
        return self.compose(Sim3(jnp.exp(lam), so3_exp(omega), nu))

    def chart_log(self) -> Array:
        """(t, ln R, ln s) — the 7-dof error chart (identity iff self is)."""
        return jnp.concatenate(
            [self.t, so3_log(self.R), jnp.log(self.s)[..., None]], axis=-1
        )


class Sim3GraphData(NamedTuple):
    """Fixed-capacity Sim3 pose graph (N nodes, E edges). ``edge_rel`` is
    the measured similarity of dst in src coordinates (scale 1 for both
    odometry and metric loop resections); ``prior_info`` anchors nodes."""

    poses: Sim3              # (N,)
    node_mask: Array         # (N,) bool
    edge_src: Array          # (E,) int32
    edge_dst: Array          # (E,) int32
    edge_rel: Sim3           # (E,)
    edge_info: Array         # (E, 7, 7)
    edge_mask: Array         # (E,) bool
    prior_pose: Sim3         # (N,)
    prior_info: Array        # (N, 7, 7)


class Sim3GraphParams(NamedTuple):
    max_iterations: int = 100
    lambda_init: float = 1e-6
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    lambda_min: float = 1e-12
    lambda_max: float = 1e10
    rel_decrease: float = 1e-12
    # Huber threshold on the WHITENED per-edge residual norm (sigmas).
    # Loop-closure graphs carry occasional bad edges (wide-baseline
    # measurements whose error model is optimistic); IRLS-downweighting
    # them is the standard robust-PGO move (switchable-constraints
    # family). None = pure Gaussian.
    huber_delta: float | None = 3.0


class Sim3GraphResult(NamedTuple):
    poses: Sim3
    error: Array
    iterations: Array
    converged: Array


def _edge_residuals_and_jacobians(data: Sim3GraphData):
    """All-edge residuals + exact chart Jacobians wrt (delta_src, delta_dst):
    r (E, 7), Js (E, 7, 7), Jd (E, 7, 7)."""
    gather = lambda x, i: jax.tree_util.tree_map(lambda l: l[i], x)
    Ts = gather(data.poses, data.edge_src)
    Td = gather(data.poses, data.edge_dst)

    def res(delta, Ts, Td, rel):
        Tsp = Ts.retract(delta[:7])
        Tdp = Td.retract(delta[7:])
        return rel.inverse().compose(Tsp.inverse().compose(Tdp)).chart_log()

    zero = jnp.zeros((14,), data.poses.t.dtype)
    r = jax.vmap(res, in_axes=(None, 0, 0, 0))(zero, Ts, Td, data.edge_rel)
    J = jax.vmap(jax.jacfwd(res), in_axes=(None, 0, 0, 0))(
        zero, Ts, Td, data.edge_rel
    )
    return r, J[..., :7], J[..., 7:]


def _prior_residuals(data: Sim3GraphData) -> Array:
    return data.prior_pose.inverse().compose(data.poses).chart_log()


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _huber_rho_and_weight(e2: Array, delta: float | None):
    """Huber rho(e) and IRLS weight for squared whitened norms ``e2``."""
    if delta is None:
        return e2, jnp.ones_like(e2)
    e = jnp.sqrt(jnp.maximum(e2, 1e-30))
    w = jnp.minimum(1.0, delta / e)
    rho = jnp.where(e <= delta, e2, 2.0 * delta * e - delta * delta)
    return rho, w


def sim3_graph_cost(data: Sim3GraphData,
                    axis_name: str | None = None,
                    huber_delta: float | None = None) -> Array:
    r, _, _ = _edge_residuals_and_jacobians(data)
    w = data.edge_mask.astype(r.dtype)
    e2 = jnp.einsum("ei,eij,ej->e", r, data.edge_info, r)
    rho, _ = _huber_rho_and_weight(e2, huber_delta)
    c_edges = 0.5 * jnp.sum(w * rho)
    rp = _prior_residuals(data)
    c_prior = 0.5 * jnp.sum(jnp.einsum("ni,nij,nj->n", rp,
                                       data.prior_info, rp))
    return _psum(c_edges, axis_name) + c_prior


def _normal_equations(data: Sim3GraphData, axis_name: str | None = None,
                      huber_delta: float | None = None):
    N = data.poses.t.shape[0]
    dtype = data.poses.t.dtype
    r, Js, Jd = _edge_residuals_and_jacobians(data)
    w = data.edge_mask.astype(dtype)
    e2 = jnp.einsum("ei,eij,ej->e", r, data.edge_info, r)
    _, w_h = _huber_rho_and_weight(e2, huber_delta)
    w = w * w_h
    L = data.edge_info * w[:, None, None]
    JsTL = jnp.einsum("eki,ekl->eil", Js, L)
    JdTL = jnp.einsum("eki,ekl->eil", Jd, L)
    H = jnp.zeros((N, N, 7, 7), dtype)
    H = H.at[data.edge_src, data.edge_src].add(JsTL @ Js)
    Hsd = JsTL @ Jd
    H = H.at[data.edge_src, data.edge_dst].add(Hsd)
    H = H.at[data.edge_dst, data.edge_src].add(jnp.swapaxes(Hsd, -1, -2))
    H = H.at[data.edge_dst, data.edge_dst].add(JdTL @ Jd)
    b = jnp.zeros((N, 7), dtype)
    b = b.at[data.edge_src].add(-jnp.einsum("eil,el->ei", JsTL, r))
    b = b.at[data.edge_dst].add(-jnp.einsum("eil,el->ei", JdTL, r))
    H = _psum(H, axis_name)
    b = _psum(b, axis_name)
    rp = _prior_residuals(data)
    H = H.at[jnp.arange(N), jnp.arange(N)].add(data.prior_info)
    b = b - jnp.einsum("nij,nj->ni", data.prior_info, rp)
    pin = jnp.where(data.node_mask, 0.0, 1.0).astype(dtype)
    H = H.at[jnp.arange(N), jnp.arange(N)].add(
        pin[:, None, None] * jnp.eye(7, dtype=dtype)
    )
    return H, b


def sim3_graph_optimize(
    data: Sim3GraphData,
    params: Sim3GraphParams = Sim3GraphParams(),
    axis_name: str | None = None,
) -> Sim3GraphResult:
    """LM over Sim3 nodes; ``axis_name`` enables the edge-sharded
    distributed path exactly as in ``pose_graph_optimize``."""
    N = data.poses.t.shape[0]
    dtype = data.poses.t.dtype
    eye = jnp.eye(7 * N, dtype=dtype)

    def with_poses(poses: Sim3) -> Sim3GraphData:
        return data._replace(poses=poses)

    def lm_step(state):
        s, R, t, lam, cost, it, done = state
        poses = Sim3(s, R, t)
        H, b = _normal_equations(with_poses(poses), axis_name,
                                 params.huber_delta)
        H_flat = H.transpose(0, 2, 1, 3).reshape(7 * N, 7 * N)
        delta = linalg.solve_psd(H_flat + lam * eye, b.reshape(-1))
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0).reshape(N, 7)
        delta = delta * data.node_mask[:, None]
        new_poses = jax.vmap(Sim3.retract)(poses, delta)
        new_cost = sim3_graph_cost(with_poses(new_poses), axis_name,
                                   params.huber_delta)
        accept = jnp.logical_and(jnp.isfinite(new_cost), new_cost < cost)
        lam = jnp.clip(
            jnp.where(accept, lam * params.lambda_down,
                      lam * params.lambda_up),
            params.lambda_min, params.lambda_max,
        )
        s = jnp.where(accept, new_poses.s, s)
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
        return s, R, t, lam, cost, it + 1, converged

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < params.max_iterations,
                               jnp.logical_not(done))

    cost0 = sim3_graph_cost(data, axis_name, params.huber_delta)
    state0 = (
        data.poses.s, data.poses.R, data.poses.t,
        jnp.asarray(params.lambda_init, dtype), cost0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    s, R, t, lam, cost, it, done = jax.lax.while_loop(cond, lm_step, state0)
    return Sim3GraphResult(
        poses=Sim3(s, R, t), error=cost, iterations=it, converged=done
    )
