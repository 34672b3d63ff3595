"""Distributed BA tests on the 8-device virtual CPU mesh.

The reference has no distributed code (SURVEY §2.8); these tests assert the
property the reference cannot: the SAME BA problem solved on 1 device and
sharded over 8 devices gives (tolerance-)identical results, because both
run the identical ba_solve code path (axis_name psums are the only delta).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.parallel import distributed_ba_solve, make_mesh, synthetic


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    return synthetic.make_window_ba_problem(
        key, num_frames=6, num_points=256, dtype=jnp.float64
    )


def test_single_device_solve_recovers_truth(problem):
    prob, poses_true, pts_true = problem
    res = ba_mod.ba_solve(prob)
    assert bool(res.converged)
    err = jnp.max(jnp.abs(res.poses.log() - poses_true.log()))
    assert float(err) < 5e-3
    # points at depth ~12 with 1e-3 angular noise carry ~0.1 depth noise
    perr = jnp.max(jnp.abs(res.points - pts_true))
    assert float(perr) < 0.2


def test_distributed_matches_single_device(problem):
    prob, _, _ = problem
    mesh = make_mesh()
    assert mesh.devices.size == 8
    res1 = ba_mod.ba_solve(prob)
    res8 = distributed_ba_solve(prob, mesh)
    np.testing.assert_allclose(
        np.asarray(res8.poses.t), np.asarray(res1.poses.t), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res8.poses.R), np.asarray(res1.poses.R), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res8.points), np.asarray(res1.points), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res8.pose_covariance), np.asarray(res1.pose_covariance),
        rtol=1e-6, atol=1e-12,
    )
    assert int(res8.iterations) == int(res1.iterations)


def test_distributed_pads_odd_point_counts(problem):
    prob, _, _ = problem
    # 250 is not divisible by 8 — exercise the padding path
    odd = prob._replace(
        points0=prob.points0[:250],
        obs=prob.obs[:, :250],
        obs_mask=prob.obs_mask[:, :250],
        obs_weight=prob.obs_weight[:, :250],
        point_prior=prob.point_prior[:250],
        point_prior_info=prob.point_prior_info[:250],
    )
    mesh = make_mesh()
    res1 = ba_mod.ba_solve(odd)
    res8 = distributed_ba_solve(odd, mesh)
    assert res8.points.shape == (250, 3)
    np.testing.assert_allclose(
        np.asarray(res8.points), np.asarray(res1.points), atol=1e-7
    )


def test_distributed_pose_graph_matches_single_device():
    import test_pose_graph as tpg

    rng = np.random.default_rng(0)
    graph, gt, ids = tpg.build_noisy_graph(jnp.float64, rng)
    data = graph.to_data(node_capacity=8, edge_capacity=10)  # odd edge count
    from mvslam_tpu.backend import pose_graph as pg
    from mvslam_tpu.parallel import distributed_pose_graph_optimize

    res1 = pg.pose_graph_optimize(data)
    mesh = make_mesh()
    res8 = distributed_pose_graph_optimize(data, mesh)
    np.testing.assert_allclose(
        np.asarray(res8.poses.t), np.asarray(res1.poses.t), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res8.poses.R), np.asarray(res1.poses.R), atol=1e-9
    )
    assert int(res8.iterations) == int(res1.iterations)
