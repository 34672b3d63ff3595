"""Separate dispatch latency from on-device compute for the fused VO step.

Times (a) a trivial jitted op round-trip, (b) per-call stepping of the VO
pipeline, (c) the same frames driven by an on-device ``lax.scan`` — the gap
between (b) and (c) is pure host-dispatch overhead (large through a remote
TPU tunnel).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.vo_jit import VoJitParams, make_vo_step, vo_init_state
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    images = jnp.stack(
        [load_image_grayscale(f"{TSUKUBA}/{i}.jpg") for i in range(1, 6)]
    )
    images = jax.device_put(images)
    params = VoJitParams()
    step = make_vo_step(params)

    # (a) trivial round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    f(x).block_until_ready()
    t0 = time.time()
    for _ in range(20):
        x = f(x)
    x.block_until_ready()
    log(f"trivial op round-trip (chained x20): {(time.time()-t0)/20*1e3:.1f} ms")

    # (b) per-call stepping
    state = vo_init_state(params)
    for img in images:
        state, out = step(state, img, K_inv, focal)
    jax.block_until_ready(state.pose_t)
    t0 = time.time()
    passes = 10
    for _ in range(passes):
        state = vo_init_state(params)
        for img in images:
            state, out = step(state, img, K_inv, focal)
        jax.block_until_ready(state.pose_t)
    dt = time.time() - t0
    log(f"per-call: {dt/passes/5*1e3:.1f} ms/frame "
        f"({5*passes/dt:.1f} fps), tracked {int(state.frame_tracked)}/5")

    # (c) on-device scan over frames
    @jax.jit
    def run_scan(imgs):
        def body(s, img):
            s2, out = step.__wrapped__(s, img, K_inv, focal)
            return s2, out.success
        return jax.lax.scan(body, vo_init_state(params), imgs)

    state2, succ = run_scan(images)
    jax.block_until_ready(state2.pose_t)
    t0 = time.time()
    for _ in range(passes):
        state2, succ = run_scan(images)
        jax.block_until_ready(state2.pose_t)
    dt = time.time() - t0
    log(f"scan:     {dt/passes/5*1e3:.1f} ms/frame "
        f"({5*passes/dt:.1f} fps), tracked {int(state2.frame_tracked)}/5")

    # (c2) scan, many passes enqueued before blocking (steady-state tput)
    t0 = time.time()
    outs = [run_scan(images) for _ in range(passes)]
    jax.block_until_ready(outs[-1][0].pose_t)
    dt = time.time() - t0
    log(f"scan pipelined: {dt/passes/5*1e3:.1f} ms/frame ({5*passes/dt:.1f} fps)")


if __name__ == "__main__":
    main()
