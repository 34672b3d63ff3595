"""Distributed pose-graph optimization: edge-sharded LM over the mesh.

The keyframe-skeleton half of the scaling story (SURVEY §7 step 7): edges
(BetweenFactor measurements) shard across the mesh's data axis; every shard
scatter-adds its local contribution to the dense 6N x 6N system, one psum
assembles it, and the replicated solve/update keeps all shards in lockstep.
Same code path as single-device (``pose_graph_optimize`` + ``axis_name``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mvslam_tpu.backend import pose_graph as pg
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


def pad_edges(data: pg.PoseGraphData, multiple: int) -> pg.PoseGraphData:
    """Pad the edge axis to a multiple of the mesh size (masked rows)."""
    E = data.edge_src.shape[0]
    target = pad_to_multiple(E, multiple)
    extra = target - E
    if extra == 0:
        return data

    def pad(x, value=0.0):
        cfg = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    eyeE = jnp.broadcast_to(
        jnp.eye(4, dtype=data.poses.t.dtype), (extra, 4, 4)
    )
    rel = SE3(
        jnp.concatenate([data.edge_rel.R, eyeE[:, :3, :3]]),
        jnp.concatenate([data.edge_rel.t, jnp.zeros((extra, 3),
                                                    data.poses.t.dtype)]),
    )
    return data._replace(
        edge_src=pad(data.edge_src),
        edge_dst=pad(data.edge_dst),
        edge_rel=rel,
        edge_info=pad(data.edge_info),
        edge_mask=pad(data.edge_mask, False),
    )


def pad_sim3_edges(data, multiple: int):
    """Pad a ``Sim3GraphData`` edge axis to a multiple of the mesh size."""
    from mvslam_tpu.backend import sim3_graph as sg

    E = data.edge_src.shape[0]
    target = pad_to_multiple(E, multiple)
    extra = target - E
    if extra == 0:
        return data

    def pad(x, value=0.0):
        cfg = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    dtype = data.poses.t.dtype
    rel = sg.Sim3(
        jnp.concatenate([data.edge_rel.s, jnp.ones(extra, dtype)]),
        jnp.concatenate([
            data.edge_rel.R,
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (extra, 3, 3)),
        ]),
        jnp.concatenate([data.edge_rel.t, jnp.zeros((extra, 3), dtype)]),
    )
    return data._replace(
        edge_src=pad(data.edge_src),
        edge_dst=pad(data.edge_dst),
        edge_rel=rel,
        edge_info=pad(data.edge_info),
        edge_mask=pad(data.edge_mask, False),
    )


def distributed_sim3_graph_optimize(
    data,
    mesh: Mesh,
    params=None,
    axis: str = DATA_AXIS,
):
    """Edge-sharded Sim3 pose-graph LM (the scale-drift-aware monocular
    loop-closure solve, ``backend/sim3_graph.py``) — same psum-assembled
    replicated-system pattern as the SE3 variant below."""
    from mvslam_tpu.backend import sim3_graph as sg

    params = params or sg.Sim3GraphParams()
    n_dev = mesh.shape[axis]
    data = pad_sim3_edges(data, n_dev)
    sim3_rep = sg.Sim3(P(), P(), P())
    sim3_shard = sg.Sim3(P(axis), P(axis), P(axis))
    in_spec = sg.Sim3GraphData(
        poses=sim3_rep, node_mask=P(),
        edge_src=P(axis), edge_dst=P(axis), edge_rel=sim3_shard,
        edge_info=P(axis), edge_mask=P(axis),
        prior_pose=sim3_rep, prior_info=P(),
    )
    out_spec = sg.Sim3GraphResult(
        poses=sim3_rep, error=P(), iterations=P(), converged=P()
    )
    solve = jax.shard_map(
        partial(sg.sim3_graph_optimize, params=params, axis_name=axis),
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=out_spec,
    )
    return jax.jit(solve)(data)


def distributed_pose_graph_optimize(
    data: pg.PoseGraphData,
    mesh: Mesh,
    params: pg.PoseGraphParams = pg.PoseGraphParams(),
    axis: str = DATA_AXIS,
) -> pg.PoseGraphResult:
    n_dev = mesh.shape[axis]
    data = pad_edges(data, n_dev)
    in_spec = pg.PoseGraphData(
        poses=SE3(P(), P()),
        node_mask=P(),
        edge_src=P(axis),
        edge_dst=P(axis),
        edge_rel=SE3(P(axis), P(axis)),
        edge_info=P(axis),
        edge_mask=P(axis),
        prior_pose=SE3(P(), P()),
        prior_info=P(),
    )
    out_spec = pg.PoseGraphResult(
        poses=SE3(P(), P()), error=P(), iterations=P(), converged=P()
    )
    solve = jax.shard_map(
        partial(pg.pose_graph_optimize, params=params, axis_name=axis),
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=out_spec,
    )
    return jax.jit(solve)(data)
