"""Surgical ablation timing: monkey-patch suspected hot ops to no-ops and
re-time the full replay. Results are WRONG where patched — only the time
and the tracked-count (to confirm the control-flow mix didn't collapse)
matter. Suspects: argsort/top_k lowerings (serial sort networks).
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
from mvslam_tpu.ops import matching  # noqa: E402
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

    orig_take = vo_jit._masked_take
    orig_alloc = vo_jit._allocate_slots
    orig_match = matching.match_features

    def cheap_take(mask, cap):
        return jnp.arange(cap, dtype=jnp.int32), mask[:cap]

    def cheap_alloc(map_valid, map_seen, n):
        return jnp.arange(n, dtype=jnp.int32)

    def cheap_match(desc1, mask1, desc2, mask2, max_distance=None,
                    ratio=matching.LOWE_RATIO, cross_check=False):
        D = matching.hamming_matrix(desc1, desc2)
        D = jnp.where(mask2[None, :], D, matching.INVALID_DIST)
        d1 = jnp.min(D, axis=1)
        best = jnp.argmin(D, axis=1).astype(jnp.int32)
        D2 = D.at[jnp.arange(D.shape[0]), best].set(matching.INVALID_DIST)
        d2 = jnp.min(D2, axis=1)
        ok = mask1 & (d1 < ratio * d2) & (d1 <= matching.BITS)
        if max_distance is not None:
            ok = ok & (d1 <= max_distance)
        return matching.MatchResult(idx=best, dist=d1, mask=ok,
                                    second_dist=d2)

    def bench(tag):
        replay = vo_jit.make_vo_replay(params)
        state0 = jax.device_put(vo_jit.vo_init_state(params))
        t0 = time.time()
        st, _ = replay(state0, images, K_inv, focal)
        jax.block_until_ready(st.pose_t)
        comp = time.time() - t0
        t0 = time.time()
        passes = 20
        for _ in range(passes):
            st, _ = replay(state0, images, K_inv, focal)
        jax.block_until_ready(st.pose_t)
        dt = (time.time() - t0) / passes * 1e3
        log(f"{tag:24s} {dt:7.1f} ms/pass  tracked "
            f"{int(st.frame_tracked)}/5 [compile {comp:.0f}s]")
        return dt

    bench("base")
    vo_jit._masked_take = cheap_take
    bench("no argsort _masked_take")
    vo_jit._allocate_slots = cheap_alloc
    bench("+ no argsort alloc")
    matching.match_features = cheap_match
    vo_jit.matching.match_features = cheap_match
    bench("+ min/argmin matcher")
    vo_jit._masked_take = orig_take
    vo_jit._allocate_slots = orig_alloc
    bench("only cheap matcher")
    matching.match_features = orig_match
    vo_jit.matching.match_features = orig_match


if __name__ == "__main__":
    main()
