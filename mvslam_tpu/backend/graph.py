"""Host-side pose-graph API: ``Graph`` + ``GraphOptimizer``.

API-parity wrapper over the functional core in
``mvslam_tpu.backend.pose_graph``, mirroring the reference
``back-end/graph.hpp:15-110``:

- ``Graph(origin)`` — origin node with a tight prior (sigma=1e-4,
  ``graph.cpp:77,100-112``);
- ``add_pose_node(guess)`` -> node id;
- ``add_transformation_edge(src, dst, rel, covar)`` -> edge id
  (gtsam ``BetweenFactor`` equivalent, ``graph.cpp:136-159``);
- node/edge value getters and adjacency metadata;
- ``GraphOptimizer(graph)`` works on a **copy** until ``update_graph()``
  writes values back (``graph.cpp:244-266``).

The reference also declares ``reconcile_with`` (graph merge) but never
implemented it (``graph.cpp:194-206``); ``Graph.merge_from`` here is the
working equivalent.

Host mutation is plain Python (ids, dicts); every optimize call pads to the
next power-of-two capacity so XLA re-compiles only on capacity growth.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.backend import pose_graph as pg
from mvslam_tpu.math.lie import SE3


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


class Graph:
    """Mutable pose graph (reference ``Graph``, ``back-end/graph.hpp:15-72``)."""

    def __init__(self, origin: SE3 | None = None, dtype=jnp.float64) -> None:
        self._dtype = dtype
        self._poses: List[np.ndarray] = []     # (4, 4) matrices, host side
        self._edges: List[Tuple[int, int]] = []
        self._edge_rel: List[np.ndarray] = []
        self._edge_info: List[np.ndarray] = []
        self._adjacency: Dict[int, List[int]] = {}
        if origin is None:
            origin = SE3.identity(dtype=dtype)
        self._origin_id = self._append_node(origin)
        self._anchors: List[int] = [self._origin_id]

    # -- mutation ------------------------------------------------------------
    def _append_node(self, pose: SE3) -> int:
        node_id = len(self._poses)
        self._poses.append(np.asarray(pose.matrix(), dtype=np.float64))
        self._adjacency[node_id] = []
        return node_id

    def add_pose_node(self, guess: SE3) -> int:
        """Add a node with an initial-value guess (reference
        ``graph.cpp:120-134``)."""
        return self._append_node(guess)

    def add_transformation_edge(
        self, src: int, dst: int, rel: SE3, covar: np.ndarray | None = None
    ) -> int:
        """Add a BetweenFactor-style edge; ``covar`` is the 6x6 measurement
        covariance (identity if omitted). Reference ``graph.cpp:136-159``."""
        if src >= len(self._poses) or dst >= len(self._poses):
            raise KeyError(f"unknown node in edge ({src}, {dst})")
        edge_id = len(self._edges)
        self._edges.append((src, dst))
        self._edge_rel.append(np.asarray(rel.matrix(), dtype=np.float64))
        if covar is None:
            info = np.eye(6)
        else:
            info = np.linalg.inv(np.asarray(covar, dtype=np.float64))
        self._edge_info.append(info)
        self._adjacency[src].append(edge_id)
        self._adjacency[dst].append(edge_id)
        return edge_id

    def set_anchor(self, node_id: int) -> None:
        """Give ``node_id`` the same tight prior as the origin (used to
        gauge-fix additional disconnected components, e.g. tracking
        segments with no odometry edge between them)."""
        if node_id >= len(self._poses):
            raise KeyError(f"unknown node {node_id}")
        if node_id not in self._anchors:
            self._anchors.append(node_id)

    def merge_from(self, other: "Graph", anchor: SE3 | None = None) -> Dict[int, int]:
        """Import another graph's nodes/edges (the working version of the
        reference's unimplemented ``reconcile_with``, ``graph.cpp:194-206``).
        ``anchor`` re-expresses the other graph's poses in this graph's
        frame. Returns old-id -> new-id."""
        A = np.asarray(
            anchor.matrix() if anchor is not None else np.eye(4), np.float64
        )
        remap: Dict[int, int] = {}
        for old_id, M in enumerate(other._poses):
            remap[old_id] = self._append_node(
                SE3.from_matrix(jnp.asarray(A @ M, self._dtype))
            )
        for (s, d), rel, info in zip(
            other._edges, other._edge_rel, other._edge_info
        ):
            eid = len(self._edges)
            self._edges.append((remap[s], remap[d]))
            self._edge_rel.append(rel)
            self._edge_info.append(info)
            self._adjacency[remap[s]].append(eid)
            self._adjacency[remap[d]].append(eid)
        return remap

    # -- access --------------------------------------------------------------
    @property
    def origin_id(self) -> int:
        return self._origin_id

    def node_count(self) -> int:
        return len(self._poses)

    def edge_count(self) -> int:
        return len(self._edges)

    def get_pose_node_value(self, node_id: int) -> SE3:
        return SE3.from_matrix(jnp.asarray(self._poses[node_id], self._dtype))

    def get_all_pose_node_values(self) -> SE3:
        M = jnp.asarray(np.stack(self._poses), self._dtype)
        return SE3.from_matrix(M)

    def get_edge(self, edge_id: int) -> Tuple[int, int, SE3]:
        s, d = self._edges[edge_id]
        return s, d, SE3.from_matrix(jnp.asarray(self._edge_rel[edge_id], self._dtype))

    def adjacent_edges(self, node_id: int) -> List[int]:
        return list(self._adjacency[node_id])

    # -- array export ---------------------------------------------------------
    def to_data(
        self,
        node_capacity: int | None = None,
        edge_capacity: int | None = None,
    ) -> pg.PoseGraphData:
        """Pad to fixed capacity and build the jit-side problem arrays."""
        n = len(self._poses)
        e = len(self._edges)
        N = node_capacity or _next_pow2(max(n, 2))
        E = edge_capacity or _next_pow2(max(e, 2))
        dtype = self._dtype
        M = np.tile(np.eye(4), (N, 1, 1))
        M[:n] = np.stack(self._poses)
        poses = SE3.from_matrix(jnp.asarray(M, dtype))
        node_mask = jnp.arange(N) < n
        src = np.zeros(E, np.int32)
        dst = np.zeros(E, np.int32)
        rel = np.tile(np.eye(4), (E, 1, 1))
        info = np.tile(np.eye(6), (E, 1, 1))
        if e:
            src[:e] = [s for s, _ in self._edges]
            dst[:e] = [d for _, d in self._edges]
            rel[:e] = np.stack(self._edge_rel)
            info[:e] = np.stack(self._edge_info)
        prior_info = np.zeros((N, 6, 6))
        for a in self._anchors:
            prior_info[a] = np.eye(6) / (pg.ORIGIN_STDDEV**2)
        return pg.PoseGraphData(
            poses=poses,
            node_mask=node_mask,
            edge_src=jnp.asarray(src),
            edge_dst=jnp.asarray(dst),
            edge_rel=SE3.from_matrix(jnp.asarray(rel, dtype)),
            edge_info=jnp.asarray(info, dtype),
            edge_mask=jnp.arange(E) < e,
            prior_pose=poses,
            prior_info=jnp.asarray(prior_info, dtype),
        )

    def _write_back(self, poses: SE3) -> None:
        M = np.asarray(poses.matrix(), np.float64)
        for i in range(len(self._poses)):
            self._poses[i] = M[i]


class GraphOptimizer:
    """Optimizes a deep copy; ``update_graph`` writes back (reference
    ``GraphOptimizer``, ``back-end/graph.hpp:74-110``)."""

    def __init__(self, graph: Graph, params: pg.PoseGraphParams | None = None):
        self._graph = graph
        self._params = params or pg.PoseGraphParams()
        self._result: pg.PoseGraphResult | None = None

    def optimize(self) -> float:
        data = self._graph.to_data()
        self._result = pg.pose_graph_optimize(data, self._params)
        return float(self._result.error)

    @property
    def result(self) -> pg.PoseGraphResult | None:
        return self._result

    def get_optimized_pose(self, node_id: int) -> SE3:
        assert self._result is not None, "call optimize() first"
        return SE3(self._result.poses.R[node_id], self._result.poses.t[node_id])

    def update_graph(self) -> None:
        """Write optimized values back into the source graph
        (reference ``graph.cpp:260-266``)."""
        assert self._result is not None, "call optimize() first"
        n = self._graph.node_count()
        self._graph._write_back(
            SE3(self._result.poses.R[:n], self._result.poses.t[:n])
        )
