"""Reconcile PERF.md's stage table with the measured replay rate.

VERDICT r4 weak #2: the per-stage device-time table sums to ~30 ms per
5-frame pass (~168 fps) but the bench measures 58 ms/pass (85.7 fps) —
~28 ms/pass unaccounted. Hypothesis: the gap is the TUNNEL ROUND TRIP paid
once per blocked dispatch (PERF.md measures 15-30 ms per blocked call),
i.e. host-side latency, not device time. Probes:

A. blocked passes  — bench methodology: dispatch pass, block, repeat.
B. queued passes   — dispatch all passes unblocked (jax async dispatch
   pipelines them), block once at the end. If the device is the
   bottleneck, B ~= device time per pass; A - B = per-dispatch latency.
C. chained scan    — P passes inside ONE dispatch (lax.scan whose carry
   threads a zero-valued dependency into each pass's initial state so XLA
   cannot hoist or CSE the identical passes). Pure device time, zero
   per-pass dispatch cost; also the honest long-stream replay shape (a
   real dataset is hundreds of frames per dispatch).

Run: python tools/profile_replay_amortized.py [--passes 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.vo_jit import (
    VoJitParams, make_vo_replay, vo_init_state,
)
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=40)
    args = ap.parse_args()
    P = args.passes

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    images = jnp.stack([
        jax.device_put(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
        for i in range(1, 6)
    ])
    n_img = images.shape[0]
    params = VoJitParams()
    replay = make_vo_replay(params)
    state0 = jax.device_put(vo_init_state(params))

    # ---- warm ----
    t0 = time.time()
    st, _ = replay(state0, images, K_inv, focal)
    jax.block_until_ready(st.pose_t)
    print(f"warm: {time.time()-t0:.1f}s tracked {int(st.frame_tracked)}")

    # ---- A: blocked ----
    t0 = time.time()
    for _ in range(P):
        st, _ = replay(state0, images, K_inv, focal)
        jax.block_until_ready(st.pose_t)
    a = (time.time() - t0) / P
    print(f"A blocked   : {a*1e3:7.2f} ms/pass  {n_img/a:7.1f} fps")

    # ---- B: queued ----
    t0 = time.time()
    sts = [replay(state0, images, K_inv, focal)[0] for _ in range(P)]
    jax.block_until_ready(sts[-1].pose_t)
    b = (time.time() - t0) / P
    print(f"B queued    : {b*1e3:7.2f} ms/pass  {n_img/b:7.1f} fps")

    # ---- C: chained scan (P passes, one dispatch) ----
    from mvslam_tpu.frontend.vo_jit import _make_vo_step_fns
    _, _step, _, _ = _make_vo_step_fns(params)

    @jax.jit
    def multi_n(state0, images, K_inv, focal):
        def body(carry, _):
            s0 = state0._replace(step=state0.step + carry)
            s, outs = jax.lax.scan(
                lambda st, img: _step(st, img, K_inv, focal), s0, images
            )
            # carry a runtime-zero XLA cannot constant-fold (x * 0 folds,
            # hoisting the whole inner scan and faking a ~3000 fps result)
            return jnp.minimum(s.frame_tracked, 0), (s.frame_tracked, s.pose_t)

        return jax.lax.scan(body, jnp.asarray(0, jnp.int32), None, length=P)
    t0 = time.time()
    _, (tr, pt) = multi_n(state0, images, K_inv, focal)
    jax.block_until_ready(pt)
    warm_c = time.time() - t0
    t0 = time.time()
    _, (tr, pt) = multi_n(state0, images, K_inv, focal)
    jax.block_until_ready(pt)
    c = (time.time() - t0) / P
    print(f"C scan      : {c*1e3:7.2f} ms/pass  {n_img/c:7.1f} fps "
          f"(compile+first {warm_c:.1f}s, tracked last "
          f"{int(tr[-1])}/{n_img})")
    print(f"per-dispatch latency (A-B): {(a-b)*1e3:.2f} ms; "
          f"queue overhead (B-C): {(b-c)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
