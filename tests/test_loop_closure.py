"""Back-end integration: loop closure on a synthetic closed-loop path.

The reference never wired its pose-graph back-end to the tracker (SURVEY
§2.5: ``Graph`` is test-only). This test drives the full integration the
reference stopped short of: fused tracker -> keyframe skeleton -> batched
descriptor loop detection -> mutually-verified, BA-polished loop edges ->
scale-drift-aware Sim3 pose-graph LM on the 8-device virtual mesh ->
trajectory correction.

Scene: the slanted-background planes renderer (tests/helpers.py,
``bg_slope`` — continuous depth spread keeps the 90-frame loop in ONE
tracked segment) with the camera on a closed ellipse in the x-z plane,
starting where the motion is pure +x (the bootstrap's z-translation gate,
reference semantics, rejects forward-motion starts). Ground truth closes
the loop exactly; raw monocular VO accumulates real drift — measured
closure error 0.26 ground-truth units (~5% of the 5.5-unit path) on the
CPU x64 arm this test runs on, with per-segment scale drift (the reason
the graph is Sim3, ``backend/sim3_graph.py``).

Metric: LOOP-CLOSURE error — the endpoint's displacement from the anchor
keyframe vs ground truth's. (Absolute ATE would include the anchored
gauge offset, which no pose-graph optimization can observe.)

Bars are measurement-derived (r5 campaign, this exact scenario on CPU):
the accepted loop edges' relative-displacement error bottoms out at the
source keyframe map's depth-noise floor, sigma_z/z = z/(f*B)*sigma_px
~ 2-4% -> 0.018-0.074 ground-truth units at these spans; the optimized
closure lands at 0.0455 — a measured **5.7x** reduction over raw with
median per-step deviation 0.0098 (the graph redistributes drift without
shredding local geometry). Asserted at >= 4x with margin so honest
numeric jitter across BLAS builds cannot flake it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.backend.slam import BackendParams, PoseGraphBackend
from mvslam_tpu.frontend.vo_jit import (
    VoJitParams, make_vo_step, vo_init_state,
)

from helpers import render_planes_sequence

H, W = 240, 320
FOCAL = 280.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def _ellipse_loop(n=90, a=2.75, b=0.35):
    """Closed ellipse in the x-z plane (plus a small y wobble), starting at
    theta = pi/2 where the velocity is pure +x."""
    th = np.linspace(np.pi / 2, np.pi / 2 + 2 * np.pi, n)
    return np.stack(
        [a * (1 - np.cos(th)), 0.02 * np.sin(3 * th), b * np.sin(th)], 1
    )


@pytest.fixture(scope="module")
def loop_run():
    ts_gt = _ellipse_loop()
    frames = render_planes_sequence(ts_gt, h=H, w=W, focal=FOCAL,
                                    bg_slope=0.18)
    n = frames.shape[0]
    params = VoJitParams()
    step = make_vo_step(params)
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(
        [[FOCAL, 0, CX], [0, FOCAL, CY], [0, 0, 1]], np.float64
    )), jnp.float32)
    focal = jnp.asarray(FOCAL, jnp.float32)
    backend = PoseGraphBackend(BackendParams(), focal=FOCAL)
    state = vo_init_state(params)
    raw = []
    ok = []
    for i in range(n):
        state, out = step(state, jnp.asarray(frames[i]), K_inv, focal)
        backend.add_frame(i, state, out)
        ok.append(bool(out.success))
        raw.append(np.asarray(out.pose_t))
    return ts_gt, np.asarray(raw), np.asarray(ok), backend


def _fit_scale(raw, gt, n):
    """Similarity scale of tracker units to ground truth, fit on the
    first half (the tracker's monocular scale is arbitrary)."""
    half = np.arange(2, n // 2)
    X, G = raw[half], gt[half]
    Xc, Gc = X - X.mean(0), G - G.mean(0)
    return float((Xc * Gc).sum() / max((Xc * Xc).sum(), 1e-12))


def test_sequence_stays_tracked(loop_run):
    ts_gt, raw, ok, backend = loop_run
    n = len(ok)
    # the loop path is benign: a reset would fork the trajectory into
    # incomparable scale segments, so require an unbroken track after
    # bootstrap (frame 0 cannot track by definition)
    assert ok[1:].all(), f"tracked {ok.sum()}/{n}"
    assert len(backend.keyframes) >= 10
    assert all(k.segment == 0 for k in backend.keyframes)


def test_loop_edges_found_and_verified(loop_run):
    ts_gt, raw, ok, backend = loop_run
    assert backend.loop_edges, "no loop closures accepted"
    spans = [i - j for j, i, *_ in backend.loop_edges]
    assert max(spans) >= backend.p.min_loop_gap
    gt = ts_gt - ts_gt[0]
    s = _fit_scale(raw, gt, len(raw))
    for j, i, rel, n_inl, s_rel in backend.loop_edges:
        assert n_inl >= backend.p.min_loop_inliers
        # candidates really are view-overlapping revisits
        kf_i, kf_j = backend.keyframes[i], backend.keyframes[j]
        gt_d = float(np.linalg.norm(
            ts_gt[kf_i.frame_idx] - ts_gt[kf_j.frame_idx]
        ))
        assert gt_d < 2.8, (j, i, gt_d)
        # the measurement's relative displacement must be consistent with
        # ground truth to ~12% of span + a floor (mutual verification +
        # BA polish reject anything grossly wrong; the residual is the
        # source map's depth-noise floor, see module docstring)
        disp_est = s * np.asarray(kf_j.pose.R) @ np.asarray(rel.t)
        disp_gt = gt[kf_i.frame_idx] - gt[kf_j.frame_idx]
        err = float(np.linalg.norm(disp_est - disp_gt))
        assert err <= 0.12 * max(float(np.linalg.norm(disp_gt)), 1.0) + 0.1, (
            j, i, err, float(np.linalg.norm(disp_gt))
        )
        # the Sim3 scale observation is a sane ratio
        assert 0.8 < s_rel < 1.25, (j, i, s_rel)


def test_pose_graph_shrinks_loop_closure_error(loop_run):
    ts_gt, raw, ok, backend = loop_run
    n = len(raw)
    gt = ts_gt - ts_gt[0]
    s = _fit_scale(raw, gt, n)
    kf0 = backend.keyframes[0]
    d_gt_end = gt[-1] - gt[kf0.frame_idx]

    def closure(t_end, t_anchor):
        d_est = s * (np.asarray(t_end) - np.asarray(t_anchor))
        return float(np.linalg.norm(d_est - d_gt_end))

    raw_cl = closure(raw[-1], kf0.pose.t)
    assert raw_cl > 0.05, f"no real drift to repair ({raw_cl})"

    # optimize the skeleton on the virtual 8-device mesh (edge-sharded
    # Sim3 — the scale-drift-aware monocular PGO)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    opt = backend.optimize(mesh=mesh, method="sim3")
    corrected = backend.correct_trajectory(opt)
    idx_last, _, t_last = corrected[-1]
    assert idx_last == n - 1
    opt_cl = closure(t_last, opt.t[0])

    # measured r5 on this arm: raw 0.2602 -> 0.0455 (x5.7), against a
    # per-edge floor of 0.018-0.074; assert with margin
    assert opt_cl <= raw_cl / 4.0, (raw_cl, opt_cl)
    assert opt_cl <= 0.08, opt_cl

    # local consistency must survive the correction: per-frame relative
    # steps of the corrected trajectory stay close to the raw tracker's
    # (the graph redistributes drift, it must not shred the trajectory)
    t_corr = np.stack([t for _, _, t in corrected])
    t_raw = raw[np.asarray([i for i, _, _ in corrected])]
    step_corr = np.diff(t_corr, axis=0)
    step_raw = np.diff(t_raw, axis=0)
    step_dev = np.linalg.norm(step_corr - step_raw, axis=1)
    assert float(np.median(step_dev)) < 0.15, float(np.median(step_dev))


def test_distributed_sim3_matches_local(loop_run):
    ts_gt, raw, ok, backend = loop_run
    from jax.sharding import Mesh

    opt_local = backend.optimize(method="sim3")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    opt_dist = backend.optimize(mesh=mesh, method="sim3")
    np.testing.assert_allclose(
        np.asarray(opt_dist.t), np.asarray(opt_local.t), atol=1e-8
    )
