"""Rotating-camera tracking: the rotation path exercised end-to-end.

Every other tracker scenario (tsukuba included) is pure translation with
identity rotation; this renders a sequence with a yaw oscillation (exact
analytic ground truth — helpers.render_planes_sequence ``yaws``) and
asserts the fused tracker's recovered camera rotations match it.

Rotation estimates share the world gauge of their tracking segment (the
world frame is the segment's bootstrap base camera, including ITS yaw),
so residuals are evaluated per contiguous tracked segment after removing
the per-segment constant offset. Measured on this arm: residual max
0.0006-0.003 rad (0.03-0.17 deg), regression slope 1.00-1.01.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.frontend.vo_jit import (
    VoJitParams, make_vo_step, vo_init_state,
)

from helpers import render_planes_sequence

H, W = 240, 320
FOCAL = 280.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


@pytest.fixture(scope="module")
def yaw_run():
    n = 40
    i = np.arange(n)
    ts = np.stack([i * 0.12, 0.02 * np.sin(i * 0.25), np.zeros(n)], 1)
    yaws = 0.06 * np.sin(i * 0.3)
    frames = render_planes_sequence(ts, h=H, w=W, focal=FOCAL,
                                    bg_slope=0.18, yaws=yaws)
    params = VoJitParams()
    step = make_vo_step(params)
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(
        [[FOCAL, 0, CX], [0, FOCAL, CY], [0, 0, 1]], np.float64
    )), jnp.float32)
    focal = jnp.asarray(FOCAL, jnp.float32)
    state = vo_init_state(params)
    oks, yest = [], []
    for k in range(n):
        state, out = step(state, jnp.asarray(frames[k]), K_inv, focal)
        oks.append(bool(out.success))
        R = np.asarray(out.pose_R)
        # yaw of a R_y rotation: R[0,2]=sin, R[2,2]=cos
        yest.append(float(np.arctan2(R[0, 2], R[2, 2])))
    return yaws, np.asarray(oks), np.asarray(yest)


def _segments(oks):
    segs, start = [], None
    for k, o in enumerate(oks):
        if o and start is None:
            start = k
        if not o and start is not None:
            segs.append((start, k))
            start = None
    if start is not None:
        segs.append((start, len(oks)))
    return segs


def test_rotation_sequence_tracks(yaw_run):
    yaws, oks, yest = yaw_run
    n = len(oks)
    assert oks.sum() >= int(0.9 * n), f"tracked {oks.sum()}/{n}"
    a, b = max(_segments(oks), key=lambda s: s[1] - s[0])
    assert b - a >= int(0.6 * n)
    # the scenario really exercises rotation inside that segment
    assert yaws[a:b].max() - yaws[a:b].min() >= 0.08


def test_yaw_recovered_per_segment(yaw_run):
    yaws, oks, yest = yaw_run
    checked = 0
    for a, b in _segments(oks):
        if b - a < 6:
            continue
        sel = np.arange(a, b)
        resid = yest[sel] - yaws[sel]
        r = resid - np.median(resid)      # remove the segment gauge offset
        assert np.abs(r).max() < 0.01, (a, b, float(np.abs(r).max()))
        A = np.vstack([yaws[sel], np.ones(len(sel))]).T
        slope = float(np.linalg.lstsq(A, yest[sel], rcond=None)[0][0])
        assert 0.93 < slope < 1.07, (a, b, slope)
        checked += 1
    assert checked >= 1
