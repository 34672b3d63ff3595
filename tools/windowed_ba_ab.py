"""A/B: sliding-window BA refinement vs the raw 2-frame-BA tracker.

BASELINE config 3 names "sliding-window BA"; both this repo's tracker and
the reference only ever solve 2-frame BAs in the loop (reference
``visual-odometer.cpp:617-805``). This tool measures what a W-keyframe
windowed refinement (``backend.slam.PoseGraphBackend.windowed_refine``)
buys on top:

- tsukuba (5 frames, keyframe_every=1): ATE of raw tracker poses vs
  window-refined poses against the analytic (i,0,0) trajectory;
- the synthetic two-plane sequence (tests/helpers renderer): drift of raw
  vs refined keyframe positions against ground truth over the last window.

Run: python tools/windowed_ba_ab.py (on-chip when attached; see NOTE below).
Numbers are committed to ACCURACY.md.
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
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.backend.slam import BackendParams, PoseGraphBackend
from mvslam_tpu.frontend.vo_jit import (
    VoJitParams, make_vo_step, vo_init_state,
)
from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"


def run_tracker(frames, K_inv, focal, keyframe_every=1):
    params = VoJitParams()
    step = make_vo_step(params)
    backend = PoseGraphBackend(
        BackendParams(keyframe_every=keyframe_every), focal=float(focal)
    )
    state = vo_init_state(params)
    raw = []
    for i, img in enumerate(frames):
        state, out = step(state, img, K_inv, jnp.asarray(focal, jnp.float32))
        backend.add_frame(i, state, out)
        raw.append((bool(out.success), np.asarray(out.pose_t)))
    return backend, raw


def tsukuba_ab():
    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    frames = [jnp.asarray(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
              for i in range(1, 6)]
    backend, raw = run_tracker(frames, K_inv, 350.0)
    gt = np.stack([np.arange(5.0), np.zeros(5), np.zeros(5)], 1)
    raw_err = [np.abs(t - gt[i]).max() if ok else None
               for i, (ok, t) in enumerate(raw)]
    print("tsukuba raw per-frame:",
          " ".join("--" if e is None else f"{e:.4f}" for e in raw_err))
    for w in (3, 4):
        idxs, poses, mean_err = backend.windowed_refine(window=w)
        errs = [float(np.abs(np.asarray(poses.t[k]) - gt[idx]).max())
                for k, idx in enumerate(idxs)]
        print(f"tsukuba windowed W={w}: kf frames {idxs} "
              f"per-kf err {[round(e, 4) for e in errs]} "
              f"mean_obs_err {mean_err:.3f}")


def synthetic_ab(n=60, step_len=0.12):
    from helpers import render_planes_sequence

    H, W_, FOCAL = 240, 320, 280.0
    i = np.arange(n)
    ts = np.stack([i * step_len, 0.03 * np.sin(i * 0.25), np.zeros(n)], 1)
    frames = render_planes_sequence(ts, h=H, w=W_, focal=FOCAL)
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(
        [[FOCAL, 0, (W_ - 1) / 2], [0, FOCAL, (H - 1) / 2], [0, 0, 1]],
        np.float64)), jnp.float32)
    backend, raw = run_tracker(
        [jnp.asarray(f) for f in frames], K_inv, FOCAL, keyframe_every=3
    )
    oks = np.asarray([ok for ok, _ in raw])
    print(f"synthetic tracked {oks.sum()}/{n}, "
          f"{len(backend.keyframes)} keyframes")
    est = np.stack([t for ok, t in raw if ok])
    gt = ts[oks] - ts[0]
    Xc = est - est.mean(0)
    Gc = gt - gt.mean(0)
    s = float((Xc * Gc).sum() / (Xc * Xc).sum())
    c = gt.mean(0) - s * est.mean(0)
    for w in (4, 8):
        idxs, poses, mean_err = backend.windowed_refine(window=w)
        raw_errs, ref_errs = [], []
        for k, idx in enumerate(idxs):
            kf = backend.keyframes[len(backend.keyframes) - len(idxs) + k]
            g = ts[idx] - ts[0]
            raw_errs.append(np.linalg.norm(s * np.asarray(kf.pose.t) + c - g))
            ref_errs.append(np.linalg.norm(s * np.asarray(poses.t[k]) + c - g))
        print(f"synthetic windowed W={w}: raw kf err "
              f"{[round(float(e), 4) for e in raw_errs]} -> refined "
              f"{[round(float(e), 4) for e in ref_errs]} "
              f"mean_obs_err {mean_err:.3f}")


if __name__ == "__main__":
    tsukuba_ab()
    synthetic_ab()
