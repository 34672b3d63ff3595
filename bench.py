"""Benchmark: tsukuba visual-odometry throughput on one chip — WITH an
on-device accuracy gate.

Prints ONE JSON line:
  {"metric": "tsukuba_frames_per_s", "value": N, "unit": "frames/s/chip",
   "vs_baseline": N / 10.0, "ok": bool, ...}

and exits nonzero when the chip-resident tracker misses the accuracy
envelope (tracked < 4/5 frames or max |t - (i,0,0)| > 0.08). Speed of a
wrong answer is not a result: the reference's own oracle is the tsukuba
analytic trajectory (``test-visual-odometer.cpp:62,98-102``; pose at frame
i = translation (i,0,0)), and this repo's re-derived f32 envelope is 0.08
(see tests/test_visual_odometer.py).

Extra fields:
- ``online_fps``: single-frame-dispatch rate (one ``step`` call per frame —
  the live-camera path) next to the scan-amortized ``replay`` rate.
- ``ba_iters_per_s``: LM iteration rate of the sparse (fixed-degree,
  PCG-Schur) bundle adjustment on a 256-keyframe/8k-landmark synthetic
  window — the BASELINE.json "BA iters/s" metric.

Baseline note: the reference publishes no performance numbers
(``README.md:1-27``; BASELINE.json "published": {}). Its own FrameManager
test pins the tsukuba capture rate at 10 fps (``test-frame-manager.cpp:
12-14,44``) — the real-time envelope the reference targets on CPU — so
``vs_baseline`` is reported against 10 frames/s.

``--profile <dir>`` wraps the timed section in a ``jax.profiler`` trace.
Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TSUKUBA = "/root/reference/data/tsukuba"
# ATE bound set from MEASUREMENT, not from a best run (r5, ACCURACY.md):
# the default config's ate_max is 0.018 on PIL-decoded pixels and 0.038 on
# native-libjpeg pixels whose IDCT differs by only 0.07 grey levels — the
# envelope carries ~±0.02 of input-perturbation jitter, concentrated in
# the first post-bootstrap frame (the bootstrap depth-error transient,
# tools/probe_frame3.py). Patchwise subpixel registration
# (tools/accuracy_floor.py) puts tsukuba's true inter-frame structure at
# ~0.05 px vertical alignment noise with NON-integer disparities, so the
# sub-2% trajectory error the tracker resolves is at the data's own
# noise floor. 0.05 is the measured per-run envelope; a silent accuracy
# regression still fails the bench.
ATE_BOUND = 0.05
MIN_TRACKED = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_ba_iters() -> float:
    """Sparse-BA LM iteration rate on a synthetic 256-kf/8k-landmark window."""
    import jax.numpy as jnp

    from mvslam_tpu.ops import ba_sparse
    from mvslam_tpu.parallel.synthetic import make_sequence_ba_problem

    prob, _, _ = make_sequence_ba_problem(
        jax.random.PRNGKey(0), num_frames=256, points_per_frame=32,
        window=4, dtype=jnp.float32,
    )
    iters = 10
    params = ba_sparse.SparseBAParams(
        max_iterations=iters, cg_iterations=20, rel_decrease=0.0,
        lambda_max=1e30,  # never early-stop: measure the full iteration rate
    )
    solve = jax.jit(lambda p: ba_sparse.sparse_ba_solve(p, params))
    res = solve(prob)
    jax.block_until_ready(res.points)          # compile + warmup
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        res = solve(prob)
        jax.block_until_ready(res.points)
    dt = time.time() - t0
    it_total = reps * int(res.iterations)
    rate = it_total / dt if dt > 0 else 0.0
    log(f"ba bench: {int(res.iterations)} iters/solve x {reps}, "
        f"{dt:.2f}s -> {rate:.1f} LM iters/s "
        f"(256 kf, {prob.points0.shape[0]} landmarks, D=4)")
    return rate


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the timed runs")
    ap.add_argument("--skip-ba-bench", action="store_true")
    ap.add_argument("--skip-long", action="store_true",
                    help="skip the 110-frame synthetic long-sequence section")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from mvslam_tpu.frontend.vo_jit import (
        VoJitParams, make_vo_replay, make_vo_step, vo_init_state,
    )
    from mvslam_tpu.io import load_image_grayscale
    from mvslam_tpu.ops.camera import PinholeCamera

    log(f"devices: {jax.devices()}")
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    # decode-path consistency (r4 advisor): the accuracy gate runs on the
    # SAME pixels as the decode-timed path — native libjpeg when built —
    # and the native/PIL IDCT agreement is asserted once
    from mvslam_tpu.io import native_loader

    paths5 = [f"{TSUKUBA}/{i}.jpg" for i in range(1, 6)]
    pil_imgs = [np.asarray(load_image_grayscale(p)) for p in paths5]
    if native_loader.available():
        nat_imgs = [np.asarray(native_loader.decode_jpeg_gray(p))
                    for p in paths5]
        dmax = max(float(np.abs(a - b).max())
                   for a, b in zip(nat_imgs, pil_imgs))
        log(f"decode agreement native vs PIL: max |diff| {dmax:.2f} "
            f"grey levels")
        assert dmax <= 2.0, f"decoders disagree by {dmax} grey levels"
        host_imgs = nat_imgs
    else:
        host_imgs = pil_imgs
    images = jnp.stack([jax.device_put(jnp.asarray(a)) for a in host_imgs])
    n_img = images.shape[0]
    params = VoJitParams()
    replay = make_vo_replay(params)
    step = make_vo_step(params)

    state0 = jax.device_put(vo_init_state(params))

    def run_sequence():
        state, outs = replay(state0, images, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        return state, outs

    def run_sequence_async():
        state, _ = replay(state0, images, K_inv, focal)
        return state

    # warmup: compiles the fused scan (persistent-cached across runs)
    t0 = time.time()
    state, outs = run_sequence()
    log(f"warmup pass: {time.time() - t0:.1f}s, "
        f"tracked {int(state.frame_tracked)}/{n_img}")

    # XLA's own FLOP count for one replay pass — the honest numerator for
    # an MFU estimate (VERDICT r2 item 3). Denominator assumption: v5e
    # peak 197 TFLOP/s bf16 (jax matmul precision is pinned to f32 for
    # geometry, so this is a LOWER bound on utilization headroom).
    flops_per_pass = None
    try:
        ca = (
            replay.lower(state0, images, K_inv, focal).compile()
            .cost_analysis()
        )
        if ca:
            flops_per_pass = float(ca.get("flops", 0.0)) or None
    except Exception as e:                      # axon backend may not expose it
        log(f"cost_analysis unavailable: {e}")
    log("per-frame: " + " ".join(
        f"[{i+1}: ok={int(outs.success[i])} mode={int(outs.mode[i])} "
        f"inl={int(outs.num_inliers[i])} err={float(outs.mean_error[i]):.2e} "
        f"t=({float(outs.pose_t[i, 0]):.3f},{float(outs.pose_t[i, 1]):.3f},"
        f"{float(outs.pose_t[i, 2]):.3f})]"
        for i in range(n_img)))

    # -- accuracy gate (reference oracle: pose at frame i = (i-1, 0, 0) in
    # the bootstrap frame; frames are 1-indexed here, frame 1 bootstraps) --
    tracked = int(state.frame_tracked)
    t_dev = np.asarray(outs.pose_t)
    gt = np.stack([np.arange(n_img, dtype=np.float64),
                   np.zeros(n_img), np.zeros(n_img)], axis=1)
    ok_frames = np.asarray(outs.success).astype(bool)
    ate = np.abs(t_dev - gt)[ok_frames]
    ate_max = float(np.max(ate)) if ate.size else float("inf")
    accuracy_ok = tracked >= MIN_TRACKED and ate_max <= ATE_BOUND
    log(f"accuracy: tracked {tracked}/{n_img}, max|t-gt| {ate_max:.4f} "
        f"(bound {ATE_BOUND}) -> {'OK' if accuracy_ok else 'FAIL'}")

    prof = None
    if args.profile:
        jax.profiler.start_trace(args.profile)
        prof = args.profile

    # timed passes over the full 5-frame pipeline (bootstrap + tracking),
    # one device dispatch per pass (lax.scan over the image batch).
    # QUEUED methodology (r5): passes dispatch asynchronously and block
    # once at the end — the standard JAX pattern for independent work.
    # Blocking after every pass instead charges the remote-TPU tunnel's
    # 15-30 ms round trip to every pass, which is host latency, not device
    # time (r5 probe, tools/profile_replay_amortized.py: blocked 55.9 ->
    # queued 30.3 ms/pass; PERF.md's ~30 ms device-stage sum matches the
    # queued number). The blocked rate is kept as a diagnostic field.
    passes = 40
    t0 = time.time()
    states = [run_sequence_async() for _ in range(passes)]
    jax.block_until_ready(states[-1].pose_t)
    elapsed = time.time() - t0
    n_frames = passes * n_img
    fps = n_frames / elapsed
    state = states[-1]
    t0 = time.time()
    for _ in range(10):
        state, _ = run_sequence()
    blocked_fps = 10 * n_img / (time.time() - t0)
    log(f"timed: {n_frames} frames in {elapsed:.2f}s queued "
        f"({fps:.1f} fps; blocked diagnostic {blocked_fps:.1f} fps), "
        f"tracked {int(state.frame_tracked)}/{n_img} last pass, "
        f"map {int(state.map_valid.sum())}")

    # online mode: one dispatch per frame (live-camera latency path)
    st = state0
    for i in range(n_img):                      # warmup the step compile
        st, _ = step(st, images[i], K_inv, focal)
    jax.block_until_ready(st.pose_t)
    t0 = time.time()
    online_frames = 0
    for _ in range(passes):
        st = state0
        for i in range(n_img):
            st, _ = step(st, images[i], K_inv, focal)
        jax.block_until_ready(st.pose_t)
        online_frames += n_img
    online_fps = online_frames / (time.time() - t0)
    log(f"online: {online_fps:.1f} frames/s (single-frame dispatch)")

    # pipelined online mode (SURVEY §2.8 pipeline-parallel row): the step
    # split at its state-independent seam — frame t+1's host decode +
    # `pre` dispatch overlap frame t's in-flight `combine` (+ the decode
    # is in the loop for BOTH paths, so the delta is pure overlap). The
    # decode itself uses the native libjpeg loader when built (the
    # reference's C++ image layer, native/loader.cpp); PIL otherwise.
    from mvslam_tpu.frontend.vo_jit import make_vo_pipelined
    from mvslam_tpu.io import load_image_grayscale
    from mvslam_tpu.io import native_loader

    if native_loader.available():
        _decode = native_loader.decode_jpeg_gray
        log("decode path: native libjpeg loader")
    else:
        _decode = load_image_grayscale
        log("decode path: PIL fallback")

    pre, combine = make_vo_pipelined(params)
    paths = [f"{TSUKUBA}/{i}.jpg" for i in range(1, 6)]

    def run_online_decode(pipelined: bool):
        st = state0
        if pipelined:
            nxt = pre(jax.device_put(jnp.asarray(_decode(paths[0]))),
                      K_inv, focal)
            for i in range(n_img):
                cur = nxt
                if i + 1 < n_img:
                    nxt = pre(jax.device_put(jnp.asarray(_decode(paths[i + 1]))),
                              K_inv, focal)
                st, _ = combine(st, *cur, K_inv, focal)
        else:
            for i in range(n_img):
                img = jax.device_put(jnp.asarray(_decode(paths[i])))
                st, out = step(st, img, K_inv, focal)
                jax.block_until_ready(out.pose_t)   # serialize: no overlap
        jax.block_until_ready(st.pose_t)
        return st

    run_online_decode(True)                      # warmup pre/combine compile
    seq_fps = pipe_fps = 0.0
    for pipelined in (False, True):
        t0 = time.time()
        nf = 0
        for _ in range(passes):
            stf = run_online_decode(pipelined)
            nf += n_img
        rate = nf / (time.time() - t0)
        if pipelined:
            pipe_fps = rate
        else:
            seq_fps = rate
    log(f"online+decode: sequential {seq_fps:.1f} -> pipelined "
        f"{pipe_fps:.1f} frames/s (tracked {int(stf.frame_tracked)}/{n_img})")

    if prof:
        jax.profiler.stop_trace()
        log(f"profile trace written to {prof}")

    # -- sustained long-sequence tracking (the 110-frame synthetic; VERDICT
    # r4 item 8: BENCH should not be 5-frame restarts only). One dispatch
    # replays all 110 frames; rate is queued over a few passes.
    long_fps = 0.0
    long_tracked = 0.0
    if not args.skip_long:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from helpers import render_planes_sequence

        n_long = 110
        ii = np.arange(n_long)
        ts_path = np.stack(
            [ii * 0.12, 0.03 * np.sin(ii * 0.25), np.zeros(n_long)], 1)
        lf = 300.0
        frames_np = render_planes_sequence(ts_path, h=288, w=384, focal=lf)
        long_imgs = jax.device_put(jnp.asarray(frames_np))
        K_inv_l = jnp.asarray(np.linalg.inv(np.asarray(
            [[lf, 0, (384 - 1) / 2], [0, lf, (288 - 1) / 2], [0, 0, 1]],
            np.float64)), jnp.float32)
        lf_j = jnp.asarray(lf, jnp.float32)
        st_l, _ = replay(state0, long_imgs, K_inv_l, lf_j)
        jax.block_until_ready(st_l.pose_t)          # warmup/compile
        long_tracked = int(st_l.frame_tracked) / n_long
        t0 = time.time()
        reps = 4
        sts = [replay(state0, long_imgs, K_inv_l, lf_j)[0]
               for _ in range(reps)]
        jax.block_until_ready(sts[-1].pose_t)
        long_fps = reps * n_long / (time.time() - t0)
        log(f"long-sequence: {n_long}-frame synthetic, sustained "
            f"{long_fps:.1f} frames/s, tracked {long_tracked:.0%}")

    ba_rate = 0.0 if args.skip_ba_bench else bench_ba_iters()

    # "mode": scan-based dataset replay, passes dispatched asynchronously
    # and blocked once (r5 methodology change; the per-pass-blocked rate is
    # the replay_blocked_fps field) — keeps round-over-round BENCH
    # comparisons methodology-explicit.
    print(json.dumps({
        "metric": "tsukuba_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 10.0, 3),
        "mode": "replay-queued",
        "ok": bool(accuracy_ok),
        "tracked": tracked,
        "ate_max": round(ate_max, 4),
        "replay_blocked_fps": round(blocked_fps, 3),
        "online_fps": round(online_fps, 3),
        "online_decode_fps": round(seq_fps, 3),
        "online_pipelined_fps": round(pipe_fps, 3),
        "long_seq_fps": round(long_fps, 3),
        "long_seq_tracked_frac": round(long_tracked, 3),
        "ba_iters_per_s": round(ba_rate, 2),
        "flops_per_frame": (None if flops_per_pass is None
                            else round(flops_per_pass / n_img)),
        "mfu_vs_bf16_peak": (
            None if flops_per_pass is None
            else round(flops_per_pass / n_img * fps / 197e12, 8)
        ),
    }))
    return 0 if accuracy_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
