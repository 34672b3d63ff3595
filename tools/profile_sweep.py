"""Reliable stage attribution by end-to-end replay variants in ONE process.

Per-process timing on the tunneled TPU is bimodal, so micro-benchmarks lie;
within a single process, relative comparisons hold. This sweeps replay
configurations (frame-count prefixes + param ablations) and derives stage
costs from differences of full-pipeline numbers.
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

    def bench(name, params, imgs, passes=20):
        replay = make_vo_replay(params)
        state0 = jax.device_put(vo_init_state(params))
        t0 = time.time()
        state, outs = replay(state0, imgs, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(passes):
            state, outs = replay(state0, imgs, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        dt = (time.time() - t0) / passes * 1e3
        n = imgs.shape[0]
        tr = int(state.frame_tracked)
        t_dev = np.asarray(outs.pose_t)
        gt = np.stack([np.arange(n, dtype=np.float64),
                       np.zeros(n), np.zeros(n)], 1)
        okf = np.asarray(outs.success).astype(bool)
        ate = float(np.max(np.abs(t_dev - gt)[okf])) if okf.any() else float("inf")
        log(f"{name:28s} {dt:8.2f} ms/pass ({n} frames, {dt/n:6.2f} ms/f) "
            f"tracked {tr}/{n} ate {ate:.4f} [compile {compile_s:.0f}s]")
        return dt

    base = VoJitParams()
    t5 = bench("base x5", base, images)
    t2 = bench("base x2 (empty+init)", base, images[:2])
    t1 = bench("base x1 (empty)", base, images[:1])
    log(f"  -> derived: empty+pre={t1:.1f}  init={t2 - t1:.1f}  "
        f"track={(t5 - t2) / 3:.1f} ms/frame")

    import sys as _sys
    which = _sys.argv[1:] or None
    for name, params in [
        ("orb-batched", base._replace(orb=base.orb._replace(batched=True))),
        ("ba10", base._replace(ba_iterations=10)),
        ("no-klt", base._replace(use_klt=False)),
        ("levels4", base._replace(orb=base.orb._replace(num_levels=4))),
        ("hyp128", base._replace(ransac_hypotheses=128, pnp_hypotheses=128)),
        ("init_window2", base._replace(init_window=2)),
        ("ba_cap 256+64", base._replace(ba_old=256, ba_new=64)),
    ]:
        if which and name not in which:
            continue
        bench(name, params, images)


if __name__ == "__main__":
    main()
