"""Localize the frame-3 mean-error outlier (VERDICT r4 weak #3).

Every bench round shows the FIRST post-bootstrap tracking frame with BA
mean error ~6 while later frames sit at ~0.7-1.0 (gate 9.0). Candidate
causes, each isolated by a param variant (static params -> one compile
per variant; run on CPU):

- anchors:    the template-anchor observations (weight focal/0.02 px) on
  fresh triangulations amplify ~0.05 px alignment noise to whitened
  residuals of ~2.5 sigma. If frame 3's error collapses when
  ``template_sigma_px`` is relaxed to the KLT sigma (0.25 px), the
  outlier is anchor-weighted noise, not geometry failure.
- convergence: if 25 LM iterations flatten frame 3, the warm start from
  PnP+bootstrap map is simply further from the optimum on the first
  tracked frame.
- bootstrap depth: if neither moves frame 3 but the error decays by
  frame 4-5 under ALL variants, the excess is bootstrap-depth error being
  re-resolved through the landmark information filter (expected decay).

Prints per-frame (success, mean_error, |t - gt|_max) per variant.
Run: python tools/probe_frame3.py [--both] (on-chip when attached).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# NOTE: a site hook imports jax at interpreter startup, so JAX_PLATFORMS
# must be set BEFORE python starts to have any effect ("JAX_PLATFORMS=cpu
# python tools/...").  Invoked bare, this tool runs on the default
# platform — the REAL TPU chip when one is attached (the bench platform;
# the numbers committed to ACCURACY.md are on-chip).

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


def _decode(path: str, native: bool):
    if native:
        from mvslam_tpu.io import native_loader

        return native_loader.decode_jpeg_gray(path)
    return load_image_grayscale(path)


def run(tag, params, native=False):
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    imgs = jnp.stack([
        jnp.asarray(_decode(f"{TSUKUBA}/{i}.jpg", native))
        for i in range(1, 6)
    ])
    replay = make_vo_replay(params)
    state, outs = replay(vo_init_state(params), imgs, K_inv, focal)
    jax.block_until_ready(state.pose_t)
    gt = np.stack([np.arange(5.0), np.zeros(5), np.zeros(5)], 1)
    t = np.asarray(outs.pose_t)
    ok = np.asarray(outs.success)
    err = np.asarray(outs.mean_error)
    ate = np.abs(t - gt).max(axis=1)
    cells = " ".join(
        f"[{i+1}: {'ok' if ok[i] else '--'} e={err[i]:8.2e} "
        f"ate={ate[i] if ok[i] else float('nan'):.4f}]"
        for i in range(5)
    )
    ate_max = float(ate[ok.astype(bool)].max())
    print(f"{tag:28s} {cells}  ate_max={ate_max:.4f}")
    return err, ate_max


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--native", action="store_true",
                    help="decode with the native libjpeg loader (the bench "
                         "decode path); default PIL")
    ap.add_argument("--both", action="store_true",
                    help="run every variant under BOTH decoders (the ate "
                         "sensitivity to 0.07-grey-level IDCT differences "
                         "is part of what is being diagnosed)")
    args = ap.parse_args()
    variants = [
        ("default", VoJitParams()),
        ("anchor=0.25px", VoJitParams(template_sigma_px=0.25)),
        ("anchor=0.1px", VoJitParams(template_sigma_px=0.1)),
        ("ba_iters=25", VoJitParams(ba_iterations=25)),
        ("anchor=0.1,iters=25", VoJitParams(template_sigma_px=0.1,
                                            ba_iterations=25)),
    ]
    decoders = [False, True] if args.both else [args.native]
    for native in decoders:
        for tag, p in variants:
            run(f"{tag}[{'nat' if native else 'pil'}]", p, native=native)


if __name__ == "__main__":
    main()
