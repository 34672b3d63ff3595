"""Fused on-device VO step tests (tsukuba parity with the host VO).

The whole module shares ONE compiled fused step (module-scoped ``step``
fixture): runtime-tunable knobs like the refined-pair error gate live in
the traced state (``VoJitState.gate_pair_err``), so gate variants below
reuse the same executable instead of forcing three full fused-step
compilations — which aborted the XLA CPU compiler when the suite ran as a
single session on top of ~180 already-compiled tests.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.frontend.vo_jit import (
    MODE_INITIALIZING, MODE_TRACKING, VoJitParams, make_vo_step, vo_init_state,
)
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TSUKUBA), reason="tsukuba data absent"
)


def _camera():
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    return K_inv, jnp.asarray(350.0, jnp.float32)


@pytest.fixture(scope="module")
def step():
    """The ONE compiled fused step shared by every test in this module."""
    return make_vo_step(VoJitParams())


@pytest.fixture(scope="module")
def run(step):
    K_inv, focal = _camera()
    state = vo_init_state(VoJitParams())
    outs = []
    for i in range(1, 6):
        img = load_image_grayscale(f"{TSUKUBA}/{i}.jpg")
        state, out = step(state, img, K_inv, focal)
        outs.append(out)
    return state, outs


def test_bootstrap_then_track(run):
    state, outs = run
    assert not bool(outs[0].success)
    assert int(outs[0].mode) == MODE_INITIALIZING
    assert bool(outs[1].success)
    assert int(outs[1].mode) == MODE_TRACKING
    assert all(bool(o.success) for o in outs[2:])


def test_trajectory_envelope(run):
    state, outs = run
    for i, out in enumerate(outs[1:], start=2):
        t = np.asarray(out.pose_t)
        assert np.abs(t - [i - 1.0, 0, 0]).max() < 0.03, (i, t)


def test_state_bookkeeping(run):
    state, outs = run
    assert int(state.frame_total) == 5
    assert int(state.frame_tracked) == 4
    assert int(state.map_valid.sum()) > 100
    assert bool(jnp.all(jnp.isfinite(state.map_pos[state.map_valid])))


def test_reset_on_garbage_frame(run, step):
    state, outs = run
    # a blank frame cannot track: the step must fail gracefully and fall
    # back to INITIALIZING (the reference's self-healing reset)
    K_inv, focal = _camera()
    blank = jnp.zeros((288, 384), jnp.float32)
    new_state, out = step(state, blank, K_inv, focal)
    assert not bool(out.success)
    assert int(new_state.mode) == MODE_INITIALIZING


def test_pipelined_split_matches_fused_step(run):
    # pre/combine (pipeline-parallel split, SURVEY §2.8) must be exactly
    # the fused step: same pose trajectory on the same frames
    from mvslam_tpu.frontend.vo_jit import make_vo_pipelined

    K_inv, focal = _camera()
    params = VoJitParams()
    pre, combine = make_vo_pipelined(params)
    state = vo_init_state(params)
    outs = []
    for i in range(1, 6):
        img = load_image_grayscale(f"{TSUKUBA}/{i}.jpg")
        f, smooth = pre(img, K_inv, focal)
        state, out = combine(state, f, smooth, K_inv, focal)
        outs.append(out)
    _, fused_outs = run
    for o_split, o_fused in zip(outs, fused_outs):
        assert bool(o_split.success) == bool(o_fused.success)
        np.testing.assert_allclose(
            np.asarray(o_split.pose_t), np.asarray(o_fused.pose_t), atol=1e-5
        )


def test_bootstrap_window_skips_garbage_frame(step):
    # a corrupted frame lands mid-bootstrap: [f1, blank, f2]. A 1-frame
    # window would try f2 only against the blank (no matches) and keep
    # spinning in INITIALIZING; the ring window must reach back to f1 and
    # bootstrap at f2 with the unit-x baseline (reference 10-frame queue,
    # visual-odometer.cpp:273-346).
    K_inv, focal = _camera()
    state = vo_init_state(VoJitParams())
    blank = jnp.zeros((288, 384), jnp.float32)
    state, o1 = step(state, load_image_grayscale(f"{TSUKUBA}/1.jpg"),
                     K_inv, focal)
    state, o2 = step(state, blank, K_inv, focal)
    assert not bool(o2.success)
    state, o3 = step(state, load_image_grayscale(f"{TSUKUBA}/2.jpg"),
                     K_inv, focal)
    assert bool(o3.success), "window bootstrap must recover past the blank"
    assert int(o3.mode) == MODE_TRACKING
    t = np.asarray(o3.pose_t)
    assert np.abs(t - [1.0, 0.0, 0.0]).max() < 0.08, t


def test_bootstrap_falls_back_when_oldest_slot_fails_error_gate(step):
    """The refined-error gate must not sink the whole frame when a younger
    ring slot would pass: ``do_init`` walks ranked slots with a while_loop
    until one clears the gate (the reference pair scan falls back to a
    younger pair too, visual-odometer.cpp:273-346). ``VoStepOut.init_tried``
    counts the slots refined, making the walk directly observable.

    The gate is the TRACED state scalar ``gate_pair_err``, so all three
    gate settings below run through the module's single compiled step.

    Construction (deterministic; retune with tools of /tmp probes if the
    geometry numerics change): feed frame 1 under a never-accepting gate,
    perturb its stored ring rays by 0.13 px Gaussian noise — small enough
    that E-RANSAC and the pose pre-gates still pass, large enough that the
    LM-refined mean error (~0.12) fails a 0.10 gate — then feed frame 2
    (rejected by the tiny gate, joins the ring). At frame 3 the ring holds
    [corrupt-f1 (oldest), clean-f2]:

    - control step with gate=2.0 accepts the FIRST walked slot:
      init_tried == 1 and its error ~0.12 > 0.10 -> the oldest slot
      passes pre-gates but would fail a 0.10 error gate;
    - step with gate=0.10 must walk PAST it and accept the clean pair:
      init_tried == 2, success, error ~0.06 <= 0.10.

    The pre-fallback code rejected the whole frame in exactly this case.
    """
    K_inv, focal_j = _camera()
    focal = float(focal_j)
    imgs = {i: load_image_grayscale(f"{TSUKUBA}/{i}.jpg") for i in (1, 2, 3)}
    GATE = 0.10

    def with_gate(st, g):
        return st._replace(gate_pair_err=jnp.asarray(g, jnp.float32))

    st = with_gate(vo_init_state(VoJitParams(), seed=4), 1e-9)
    st, _ = step(st, imgs[1], K_inv, focal_j)
    rng = np.random.default_rng(7)
    pert = rng.normal(scale=0.13 / focal, size=(st.rb_rays.shape[1], 2))
    rb = np.array(st.rb_rays)
    rb[0, :, :2] += pert
    st = st._replace(rb_rays=jnp.asarray(rb, st.rb_rays.dtype))
    st, o2 = step(st, imgs[2], K_inv, focal_j)
    assert not bool(o2.success)

    # control: gate out of the way -> first walked slot (the corrupt
    # oldest) is accepted, and its refined error is above GATE
    _, o3_hi = step(with_gate(st, 2.0), imgs[3], K_inv, focal_j)
    assert bool(o3_hi.success)
    assert int(o3_hi.init_tried) == 1
    assert float(o3_hi.mean_error) > GATE, float(o3_hi.mean_error)

    # under the tight gate the walk must continue to the clean younger
    # slot and accept it
    st3, o3 = step(with_gate(st, GATE), imgs[3], K_inv, focal_j)
    assert bool(o3.success), "younger slot must rescue the frame"
    assert int(o3.init_tried) == 2, int(o3.init_tried)
    assert int(o3.mode) == MODE_TRACKING
    assert float(o3.mean_error) <= GATE, float(o3.mean_error)
    assert int(o3.num_inliers) > int(o3_hi.num_inliers)
