"""Long-sequence robustness: 100+ synthetic frames through the fused tracker.

Exercises what the 5-image tsukuba loop cannot (VERDICT r3 item 7):
map-slot eviction past capacity (``vo_jit._allocate_slots`` LRU), template
staleness over long baselines, and sustained tracking health. The scene is
two textured planes at different depths (a single plane is degenerate for
the essential-matrix bootstrap), rendered analytically with known camera
poses — the long-sequence analog of the reference's tracking-loop contract
(``visual-odometer.cpp:384-500``).

NOTE: ``tests/helpers.render_planes_sequence`` is the generalized (and
maintained) version of this renderer — arbitrary camera paths, yaw,
slanted background — used by the loop-closure/rotation tests and the
bench's long-sequence section. This file keeps its original private copy
VERBATIM because the assertions below (tracked fraction, eviction and
drift bounds) were certified against these exact frames; regenerating
them under the generalized sampler would force a re-tuning with no
coverage gain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.frontend.vo_jit import (
    VoJitParams, make_vo_replay, vo_init_state,
)

H, W = 240, 320
FOCAL = 280.0
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def _texture(rng, h, w, blur=2):
    """Smooth random texture with corner-rich structure."""
    t = rng.uniform(size=(h, w)).astype(np.float32)
    for _ in range(blur):
        t = 0.25 * (np.roll(t, 1, 0) + np.roll(t, -1, 0)
                    + np.roll(t, 1, 1) + np.roll(t, -1, 1))
    # add blocky high-contrast squares so FAST has clean corners
    sq = rng.uniform(size=(h // 16 + 1, w // 16 + 1)) > 0.5
    blocks = np.kron(sq, np.ones((16, 16))).astype(np.float32)[:h, :w]
    t = 0.6 * t + 0.4 * blocks
    return t


def _sample(tex, u, v):
    """Bilinear sample with border clamp."""
    h, w = tex.shape
    u = np.clip(u, 0.0, w - 1.001)
    v = np.clip(v, 0.0, h - 1.001)
    u0 = np.floor(u).astype(np.int32)
    v0 = np.floor(v).astype(np.int32)
    du = u - u0
    dv = v - v0
    return ((1 - dv) * ((1 - du) * tex[v0, u0] + du * tex[v0, u0 + 1])
            + dv * ((1 - du) * tex[v0 + 1, u0] + du * tex[v0 + 1, u0 + 1]))


def render_sequence(n_frames=110, step=0.12):
    """Two fronto-parallel textured planes (z=4 foreground band, z=8
    background), camera translating +x with a small y wobble. Returns
    (frames (N, H, W), translations (N, 3))."""
    rng = np.random.default_rng(42)
    ppu_bg, z_bg = 40.0, 8.0
    ppu_fg, z_fg = 70.0, 4.0
    span_x = n_frames * step + 2 * z_bg * W / FOCAL
    tex_bg = _texture(rng, int(z_bg * H / FOCAL * ppu_bg) + 64,
                      int(span_x * ppu_bg) + 64)
    tex_fg = _texture(rng, int(z_fg * H / FOCAL * ppu_fg) + 64,
                      int(span_x * ppu_fg) + 64)

    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    rx = (xs - CX) / FOCAL
    ry = (ys - CY) / FOCAL

    frames, ts = [], []
    for i in range(n_frames):
        t = np.asarray([i * step, 0.03 * np.sin(i * 0.25), 0.0],
                       dtype=np.float32)
        # plane z=z0 point hit by ray: world = t + z' * (rx, ry, 1),
        # z' = z0 - t_z
        def plane_uv(z0, ppu, tex):
            zp = z0 - t[2]
            wx = t[0] + zp * rx
            wy = t[1] + zp * ry
            return _sample(tex, (wx + 1.0) * ppu + 32,
                           (wy + z0 * H / FOCAL / 2) * ppu + 32)
        img = plane_uv(z_bg, ppu_bg, tex_bg)
        fg = plane_uv(z_fg, ppu_fg, tex_fg)
        # foreground occupies a horizontal band of the IMAGE bottom
        # (fronto-parallel strip floating at z=4)
        band = ys > (0.62 * H)
        img = np.where(band, fg, img)
        frames.append(img.astype(np.float32))
        ts.append(t)
    return np.stack(frames), np.stack(ts)


@pytest.mark.slow
def test_long_sequence_tracking_and_eviction():
    frames_np, t_gt = render_sequence()
    n = frames_np.shape[0]
    params = VoJitParams()
    replay = make_vo_replay(params)
    K_inv = jnp.asarray(
        np.linalg.inv(np.asarray(
            [[FOCAL, 0, CX], [0, FOCAL, CY], [0, 0, 1]], np.float64
        )), jnp.float32)
    state, outs = replay(vo_init_state(params), jnp.asarray(frames_np),
                         K_inv, jnp.asarray(FOCAL, jnp.float32))
    ok = np.asarray(outs.success).astype(bool)
    tracked = int(state.frame_tracked)
    # a reset in the last frames clears the map (the reference's reset
    # keeps only the newest frame too) — the map/eviction checks below
    # need a TRACKING-mode snapshot: replay the prefix ending at the last
    # tracked frame when the tail reset
    if int(state.mode) != 2:
        last_ok = int(np.nonzero(ok)[0][-1])
        from mvslam_tpu.frontend.vo_jit import make_vo_step
        step = make_vo_step(params)
        snap = vo_init_state(params)
        for i in range(last_ok + 1):
            snap, _ = step(snap, jnp.asarray(frames_np[i]), K_inv,
                           jnp.asarray(FOCAL, jnp.float32))
        state = snap
        assert int(state.mode) == 2
    # sustained tracking: while a mid-sequence reset is allowed (the
    # reference's self-healing contract), the tracker must stay locked for
    # the overwhelming majority of a benign constant-velocity sequence
    assert tracked >= int(0.9 * n), f"tracked {tracked}/{n}"

    # eviction really happened: more points were ever allocated than fit
    total_seen = tracked * min(params.ba_new, params.orb.max_features)
    assert total_seen > params.map_capacity          # capacity exceeded...
    assert int(state.map_valid.sum()) <= params.map_capacity  # ...bounded
    # LRU recycling: a substantial share of live slots was (re)written in
    # the second half of the sequence — stale-forever slots would pin the
    # map to bootstrap-era content
    seen = np.asarray(state.map_seen)[np.asarray(state.map_valid)]
    assert (seen >= 0).all()
    frac_recent = float((seen > 0.5 * n).mean())
    assert frac_recent > 0.25, f"only {frac_recent:.0%} of slots recycled"

    # trajectory health. A reset re-bootstraps with a fresh origin AND a
    # fresh monocular scale, so pose_t is only comparable within one
    # contiguous tracked segment: take the longest, fit the 1-D scale +
    # offset on x, and bound the drift over that segment's span.
    runs, start = [], None
    for i, o in enumerate(ok):
        if o and start is None:
            start = i
        if not o and start is not None:
            runs.append((start, i))
            start = None
    if start is not None:
        runs.append((start, len(ok)))
    s0, s1 = max(runs, key=lambda r: r[1] - r[0])
    assert s1 - s0 >= int(0.4 * n), f"longest tracked run {s1 - s0}/{n}"
    est = np.asarray(outs.pose_t)[s0:s1]
    gt = t_gt[s0:s1] - t_gt[s0]
    ex = est[:, 0] - est[0, 0]
    s = float((ex @ gt[:, 0]) / max(ex @ ex, 1e-9))
    resid = np.abs(s * (est - est[0]) - gt)
    span = float(gt[:, 0].max())
    assert float(resid.max()) < 0.05 * span, (s, float(resid.max()), span)
