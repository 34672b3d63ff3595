"""Pose-graph oracle tests.

Mirrors reference ``test/test-graph.cpp``: a dead-reckoned planar triangle
trajectory with noisy BetweenFactor edges plus a loop-closure edge; LM
recovers ground truth to 0.03 (``test-graph.cpp:120,191``); the optimizer
works on a copy until ``update_graph`` (``:163-196``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.backend import Graph, GraphOptimizer
from mvslam_tpu.backend import pose_graph as pg
from mvslam_tpu.math.lie import SE3, so3_from_rpy

from helpers import check_similar_se3, random_se3

RECOVERY_TOL = 0.03      # reference test-graph.cpp:120
EDGE_NOISE = 0.01        # reference test-graph.cpp edge noise sigma


def triangle_trajectory(dtype):
    """Ground-truth poses marching around a triangle, two steps per side."""
    step = SE3(jnp.eye(3, dtype=dtype), jnp.asarray([1.0, 0.0, 0.0], dtype))
    turn = SE3(so3_from_rpy(0.0, 0.0, 2.0 * np.pi / 3.0, dtype=dtype),
               jnp.zeros(3, dtype))
    poses = [SE3.identity(dtype=dtype)]
    for side in range(3):
        poses.append(poses[-1].compose(step))
        poses.append(poses[-1].compose(turn))
    return poses  # 7 poses; last coincides with the first


def build_noisy_graph(dtype, rng):
    gt = triangle_trajectory(dtype)
    covar = (EDGE_NOISE**2) * np.eye(6)
    graph = Graph(origin=gt[0], dtype=dtype)
    ids = [graph.origin_id]
    guess = gt[0]
    for k in range(1, len(gt)):
        rel_true = gt[k - 1].inverse().compose(gt[k])
        rel_noisy = rel_true.compose(random_se3(rng, EDGE_NOISE, dtype=dtype))
        guess = guess.compose(rel_noisy)          # dead reckoning
        ids.append(graph.add_pose_node(guess))
        graph.add_transformation_edge(ids[k - 1], ids[k], rel_noisy, covar)
    # loop closure: last pose back to origin with the true relative transform
    rel_loop = gt[-1].inverse().compose(gt[0])
    graph.add_transformation_edge(ids[-1], ids[0], rel_loop, covar)
    return graph, gt, ids


def test_loop_closure_recovers_trajectory(dtype):
    rng = np.random.default_rng(0)  # fixed draw: MAP-vs-truth gap is draw-dependent at this noise level
    graph, gt, ids = build_noisy_graph(dtype, rng)
    opt = GraphOptimizer(graph)
    err = opt.optimize()
    assert np.isfinite(err)
    for node_id, gt_pose in zip(ids, gt):
        got = opt.get_optimized_pose(node_id)
        assert check_similar_se3(got.astype(jnp.float64),
                                 gt_pose.astype(jnp.float64), RECOVERY_TOL)


def test_optimizer_copy_until_update(dtype):
    rng = np.random.default_rng(0)  # fixed draw: MAP-vs-truth gap is draw-dependent at this noise level
    graph, gt, ids = build_noisy_graph(dtype, rng)
    before = [np.asarray(graph.get_pose_node_value(i).matrix()) for i in ids]
    opt = GraphOptimizer(graph)
    opt.optimize()
    # source graph untouched until update_graph (reference test-graph.cpp:163-196)
    for i, b in zip(ids, before):
        assert np.allclose(np.asarray(graph.get_pose_node_value(i).matrix()), b)
    opt.update_graph()
    moved = any(
        not np.allclose(np.asarray(graph.get_pose_node_value(i).matrix()), b)
        for i, b in zip(ids, before)
    )
    assert moved
    for node_id, gt_pose in zip(ids, gt):
        got = graph.get_pose_node_value(node_id)
        assert check_similar_se3(got.astype(jnp.float64),
                                 gt_pose.astype(jnp.float64), RECOVERY_TOL)


def test_origin_stays_anchored(dtype):
    rng = np.random.default_rng(4)
    graph, gt, ids = build_noisy_graph(dtype, rng)
    opt = GraphOptimizer(graph)
    opt.optimize()
    origin = opt.get_optimized_pose(graph.origin_id)
    assert check_similar_se3(
        origin.astype(jnp.float64), gt[0].astype(jnp.float64), 1e-3
    )


def test_unknown_node_edge_raises(dtype):
    graph = Graph(dtype=dtype)
    with pytest.raises(KeyError):
        graph.add_transformation_edge(0, 99, SE3.identity(dtype=dtype))


def test_merge_from(dtype):
    rng = np.random.default_rng(5)
    g1, gt, ids = build_noisy_graph(dtype, rng)
    g2, gt2, ids2 = build_noisy_graph(dtype, rng)
    n_before = g1.node_count()
    e_before = g1.edge_count()
    remap = g1.merge_from(g2)
    assert g1.node_count() == n_before + g2.node_count()
    assert g1.edge_count() == e_before + g2.edge_count()
    # merged nodes resolvable
    for old, new in remap.items():
        _ = g1.get_pose_node_value(new)


def test_capacity_padding_masks_inactive(dtype):
    rng = np.random.default_rng(6)
    graph, gt, ids = build_noisy_graph(dtype, rng)
    data = graph.to_data(node_capacity=32, edge_capacity=64)
    res = pg.pose_graph_optimize(data)
    for node_id, gt_pose in zip(ids, gt):
        got = SE3(res.poses.R[node_id], res.poses.t[node_id])
        assert check_similar_se3(got.astype(jnp.float64),
                                 gt_pose.astype(jnp.float64), RECOVERY_TOL)
