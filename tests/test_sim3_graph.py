"""Unit tests for the scale-drift-aware Sim3 pose graph
(``backend/sim3_graph.py``): chart/retraction algebra, and recovery of a
synthetic scale-drifted chain — the generative model the module exists
for (monocular odometry whose local metric drifts smoothly; see
ACCURACY.md §8 and Strasdat et al. RSS 2010).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.backend import sim3_graph as sg


def test_sim3_group_ops(dtype):
    rng = np.random.default_rng(3)
    delta = jnp.asarray(rng.normal(0, 0.3, 7), dtype)
    T = sg.Sim3.identity(dtype=dtype).retract(delta)
    # chart_log is the exact inverse of retract at identity
    np.testing.assert_allclose(np.asarray(T.chart_log()), np.asarray(delta),
                               atol=1e-5 if dtype == jnp.float32 else 1e-12)
    # compose with inverse = identity
    I = T.compose(T.inverse())
    np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
    # action: x -> s R x + t, and compose is action composition
    x = jnp.asarray(rng.normal(0, 1, 3), dtype)
    T2 = sg.Sim3.identity(dtype=dtype).retract(
        jnp.asarray(rng.normal(0, 0.3, 7), dtype))
    lhs = T.compose(T2).apply(x)
    rhs = T.apply(T2.apply(x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def _drifted_chain(n=8, drift=0.03):
    """Ground-truth positions on a line; per-node local-metric scale drifts
    geometrically; odometry measurements are the LOCAL-metric displacements
    (scale component 1 — the tracker does not know it drifts). Returns
    (true positions, true scales, dead-reckoned init, measurements)."""
    p_true = np.stack([np.arange(n, dtype=np.float64),
                       np.zeros(n), np.zeros(n)], 1)
    s_true = (1.0 + drift) ** np.arange(n)
    rels = []
    for k in range(n - 1):
        t_meas = (p_true[k + 1] - p_true[k]) / s_true[k]
        rels.append(t_meas)
    # dead-reckoning integrates the drifted measurements at face value
    p_init = np.zeros((n, 3))
    for k in range(n - 1):
        p_init[k + 1] = p_init[k] + rels[k]
    return p_true, s_true, p_init, rels


def test_sim3_chain_recovers_scale_drift(dtype):
    if dtype == jnp.float32:
        pytest.skip("oracle-precision check; f32 covered by the loop test")
    n = 8
    p_true, s_true, p_init, rels = _drifted_chain(n)
    N, E = n, (n - 1) + 1
    eye3 = np.tile(np.eye(3), (max(N, E), 1, 1))
    poses = sg.Sim3(jnp.ones(N, dtype), jnp.asarray(eye3[:N], dtype),
                    jnp.asarray(p_init, dtype))
    src = np.arange(E, dtype=np.int32)
    dst = np.arange(1, E + 1, dtype=np.int32)
    rel_t = np.zeros((E, 3))
    rel_s = np.ones(E)
    info = np.tile(np.eye(7), (E, 1, 1))
    for k in range(n - 1):
        rel_t[k] = rels[k]
        # odometry: tight translation/rotation, LOOSE scale (the drift
        # lives there)
        info[k] = np.diag(1.0 / np.concatenate([
            np.full(3, 1e-3), np.full(3, 1e-3), [0.05]])**2)
    # loop edge 0 -> n-1: the TRUE relative displacement in node 0's
    # metric plus the true relative scale (what a revisit measures)
    src[-1], dst[-1] = 0, n - 1
    rel_t[-1] = (p_true[-1] - p_true[0]) / s_true[0]
    rel_s[-1] = s_true[-1] / s_true[0]
    info[-1] = np.diag(1.0 / np.concatenate([
        np.full(3, 1e-3), np.full(3, 1e-3), [0.01]])**2)
    prior_info = np.zeros((N, 7, 7))
    prior_info[0] = np.eye(7) * 1e8
    data = sg.Sim3GraphData(
        poses=poses,
        node_mask=jnp.ones(N, bool),
        edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
        edge_rel=sg.Sim3(jnp.asarray(rel_s, dtype),
                         jnp.asarray(eye3[:E], dtype),
                         jnp.asarray(rel_t, dtype)),
        edge_info=jnp.asarray(info, dtype),
        edge_mask=jnp.ones(E, bool),
        prior_pose=poses,
        prior_info=jnp.asarray(prior_info, dtype),
    )
    # dead reckoning is measurably wrong at the far end
    dr_err = float(np.linalg.norm(p_init[-1] - p_true[-1]))
    assert dr_err > 0.5, dr_err
    res = sg.sim3_graph_optimize(data, sg.Sim3GraphParams())
    assert bool(res.converged)
    t_opt = np.asarray(res.poses.t)
    s_opt = np.asarray(res.poses.s)
    # endpoint recovered to ~the edge noise; recovered per-node scales
    # follow the true drift profile
    assert float(np.linalg.norm(t_opt[-1] - p_true[-1])) < 0.05
    np.testing.assert_allclose(s_opt, s_true, rtol=0.03)


def test_sim3_huber_downweights_outlier_edge(dtype):
    if dtype == jnp.float32:
        pytest.skip("oracle-precision check")
    n = 6
    p_true, s_true, p_init, rels = _drifted_chain(n, drift=0.0)
    N, E = n, (n - 1) + 2
    eye3 = np.tile(np.eye(3), (max(N, E), 1, 1))
    poses = sg.Sim3(jnp.ones(N, dtype), jnp.asarray(eye3[:N], dtype),
                    jnp.asarray(p_init, dtype))
    src = np.zeros(E, np.int32)
    dst = np.zeros(E, np.int32)
    rel_t = np.zeros((E, 3))
    info = np.tile(np.eye(7), (E, 1, 1)) / 0.01**2
    for k in range(n - 1):
        src[k], dst[k] = k, k + 1
        rel_t[k] = rels[k]
    # a good loop edge and a GARBAGE one (gross outlier)
    src[-2], dst[-2] = 0, n - 1
    rel_t[-2] = p_true[-1] - p_true[0]
    src[-1], dst[-1] = 0, n - 1
    rel_t[-1] = p_true[-1] - p_true[0] + np.asarray([2.0, -1.5, 0.7])
    prior_info = np.zeros((N, 7, 7))
    prior_info[0] = np.eye(7) * 1e8
    data = sg.Sim3GraphData(
        poses=poses, node_mask=jnp.ones(N, bool),
        edge_src=jnp.asarray(src), edge_dst=jnp.asarray(dst),
        edge_rel=sg.Sim3(jnp.ones(E, dtype), jnp.asarray(eye3[:E], dtype),
                         jnp.asarray(rel_t, dtype)),
        edge_info=jnp.asarray(info, dtype),
        edge_mask=jnp.ones(E, bool),
        prior_pose=poses, prior_info=jnp.asarray(prior_info, dtype),
    )
    res_g = sg.sim3_graph_optimize(data, sg.Sim3GraphParams(huber_delta=None))
    res_h = sg.sim3_graph_optimize(data, sg.Sim3GraphParams(huber_delta=2.0))
    err_g = float(np.linalg.norm(np.asarray(res_g.poses.t[-1]) - p_true[-1]))
    err_h = float(np.linalg.norm(np.asarray(res_h.poses.t[-1]) - p_true[-1]))
    # pure Gaussian splits the difference with the outlier; Huber holds on
    assert err_h < err_g / 3, (err_g, err_h)
    assert err_h < 0.05, err_h
