"""Preprocess-vs-combine cost split in the true scan regime.

Uses the make_vo_pipelined seam: a replay scan over PRECOMPUTED
(frame_arrays, smooth) stacks isolates the state-machine cost; the full
replay in the same process gives preprocess-by-difference. Both carry the
full tracker state, so nothing gets DCE'd into a meaningless number.
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

from mvslam_tpu.frontend import vo_jit  # noqa: E402
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
    params = vo_jit.VoJitParams()
    pre, combine = vo_jit.make_vo_pipelined(params)

    # precompute the feature stacks (vmapped pre over frames)
    fs, smooths = jax.jit(jax.vmap(lambda im: pre(im, K_inv, focal)))(images)
    jax.block_until_ready(smooths)

    @jax.jit
    def replay_combine(state, fs, smooths):
        def body(s, x):
            f, sm = x
            return combine(s, f, sm, K_inv, focal)
        return jax.lax.scan(body, state, (fs, smooths))

    replay_full = vo_jit.make_vo_replay(params)
    state0 = jax.device_put(vo_jit.vo_init_state(params))

    def bench(tag, fn, *args, passes=20):
        t0 = time.time()
        st, _ = fn(*args)
        jax.block_until_ready(st.pose_t)
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(passes):
            st, _ = fn(*args)
        jax.block_until_ready(st.pose_t)
        dt = (time.time() - t0) / passes * 1e3
        log(f"{tag:18s} {dt:8.1f} ms/pass  tracked {int(st.frame_tracked)}/5"
            f" [compile {comp:.0f}s]")
        return dt

    t_full = bench("full replay", replay_full, state0, images, K_inv, focal)
    t_comb = bench("combine-only", replay_combine, state0, fs, smooths)
    t_full2 = bench("full replay (2nd)", replay_full, state0, images,
                    K_inv, focal)

    # vmapped pre alone (all 5 frames in one batched dispatch)
    prefn = jax.jit(jax.vmap(lambda im: pre(im, K_inv, focal)))
    out = prefn(images)
    jax.block_until_ready(out[1])
    t0 = time.time()
    for _ in range(20):
        out = prefn(images)
    jax.block_until_ready(out[1])
    log(f"{'vmapped pre x5':18s} {(time.time()-t0)/20*1e3:8.1f} ms/pass")
    log(f"derived preprocess-in-scan = {(t_full + t_full2)/2 - t_comb:.1f}"
        " ms/pass (5 frames)")


if __name__ == "__main__":
    main()
