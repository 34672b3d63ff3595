"""Accuracy/throughput sweep of VoJitParams variants on the real chip.

For each variant: 5-frame tsukuba replay, report per-frame |t - (i,0,0)|,
ate_max, tracked count, and replay rate. The accuracy campaign's
instrument (VERDICT r3 item 2): find the envelope floor and what buys it.

Run: python tools/profile_accuracy.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mvslam_tpu.frontend.vo_jit import (  # noqa: E402
    VoJitParams, make_vo_replay, vo_init_state,
)
from mvslam_tpu.io import load_image_grayscale  # noqa: E402
from mvslam_tpu.ops.camera import PinholeCamera  # noqa: E402

TSUKUBA = "/root/reference/data/tsukuba"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    images = jnp.stack([
        jax.device_put(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
        for i in range(1, 6)
    ])
    n = images.shape[0]

    def bench(name, params, passes=20):
        replay = make_vo_replay(params)
        state0 = jax.device_put(vo_init_state(params))
        t0 = time.time()
        state, outs = replay(state0, images, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(passes):
            state, outs = replay(state0, images, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        fps = passes * n / (time.time() - t0)
        tr = int(state.frame_tracked)
        t_dev = np.asarray(outs.pose_t)
        gt = np.stack([np.arange(n, dtype=np.float64),
                       np.zeros(n), np.zeros(n)], 1)
        okf = np.asarray(outs.success).astype(bool)
        per = np.abs(t_dev - gt).max(axis=1)
        ate = float(per[okf].max()) if okf.any() else float("inf")
        per_s = " ".join(f"{p:.4f}" if ok else "  -   "
                         for p, ok in zip(per, okf))
        log(f"{name:30s} {fps:7.1f} fps tracked {tr}/{n} "
            f"ate {ate:.4f} [{per_s}] (compile {compile_s:.0f}s)")

    base = VoJitParams()
    variants = [
        ("base(16px tri)", base),
        ("ba15", base._replace(ba_iterations=15)),
        ("ba10", base._replace(ba_iterations=10)),
        ("ba8", base._replace(ba_iterations=8)),
        ("ba10+hyp128", base._replace(ba_iterations=10,
                                      ransac_hypotheses=128)),
        ("ba10+win2", base._replace(ba_iterations=10, init_window=2)),
    ]
    which = sys.argv[1:] or None
    for name, params in variants:
        if which and name not in which:
            continue
        bench(name, params)


if __name__ == "__main__":
    main()
