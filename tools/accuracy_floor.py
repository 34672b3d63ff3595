"""Measure the tsukuba accuracy floor and test the integer-corner theory.

The repo's accuracy defense (bench.py ATE_BOUND note; tests/
test_visual_odometer.py docstring) rests on two claims that this tool
turns from docstring assertions into committed measurements (VERDICT r4
item 3):

(a) **The tsukuba sequence is pixel-aligned**: consecutive frames differ by
    per-depth-layer INTEGER horizontal disparities with ~0.05 px residual
    alignment noise. Measured here by dense patchwise registration:
    integer NCC search then Lucas-Kanade subpixel refinement per patch
    (precision <<0.01 px on synthetic shifts, validated in selftest mode).
    Statistics per consecutive pair: the fractional part of the horizontal
    shift (distance to the nearest integer) and the vertical residual.
    If the "integer disparity" claim holds, both are ~0.05 px, NOT the
    ~0.3 px one expects from an arbitrary camera move.

(b) **The reference's i*1e-3 exactness is an integer-sampling artifact**:
    its integer ORB corners (reference ``vision/visual-feature.cpp:40-49``
    via cv::ORB) land on identical pixels every frame on such a set, so its
    effective observation noise is ~0 — while a subpixel pipeline honestly
    resolves the ~0.05 px residual. Tested by A/B-ing the fused tracker:
    default (KLT subpixel observations) vs ``use_klt=False`` (raw integer
    ORB corner positions, the reference's observation model). The theory
    predicts the integer arm lands much closer to the analytic (i,0,0)
    trajectory than the subpixel arm.

Run: python tools/accuracy_floor.py [--skip-ab]   (bare = the default
platform, i.e. the real chip when attached — see the site-hook NOTE below;
prefix JAX_PLATFORMS=cpu to force CPU). Results committed to ACCURACY.md
are on-chip.
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# NOTE: a site hook imports jax at interpreter startup, so JAX_PLATFORMS
# must be set BEFORE python starts to have any effect ("JAX_PLATFORMS=cpu
# python tools/...").  Invoked bare, this tool runs on the default
# platform — the REAL TPU chip when one is attached (the bench platform;
# the numbers committed to ACCURACY.md are on-chip).

import numpy as np

TSUKUBA = "/root/reference/data/tsukuba"
PATCH = 48
STRIDE = 24
SEARCH_X = (-8, 120)       # camera moves +x -> content shifts left (u -= f/Z)
SEARCH_Y = (-6, 6)
MIN_STD = 0.03             # texture gate (images are [0, 1] floats)
MIN_NCC = 0.90


def load(path: str) -> np.ndarray:
    sys.path.insert(0, "/root/repo")
    from mvslam_tpu.io import load_image_grayscale

    return np.asarray(load_image_grayscale(path), np.float64)


def ncc_search(ref: np.ndarray, patch: np.ndarray, r0: int, c0: int):
    """Integer-peak NCC of ``patch`` in ``ref`` around (r0, c0) within the
    SEARCH window. Returns (dy, dx, ncc) or None if out of bounds."""
    h, w = ref.shape
    ys = r0 + SEARCH_Y[0]
    ye = r0 + SEARCH_Y[1] + PATCH
    xs = c0 + SEARCH_X[0]
    xe = c0 + SEARCH_X[1] + PATCH
    if ys < 0 or xs < 0 or ye > h or xe > w:
        return None
    region = ref[ys:ye, xs:xe]
    win = np.lib.stride_tricks.sliding_window_view(region, (PATCH, PATCH))
    p = patch - patch.mean()
    pn = np.linalg.norm(p)
    wm = win.mean(axis=(-2, -1), keepdims=True)
    wc = win - wm
    wn = np.sqrt((wc * wc).sum(axis=(-2, -1)))
    score = np.einsum("yxij,ij->yx", wc, p) / np.maximum(wn * pn, 1e-9)
    iy, ix = np.unravel_index(np.argmax(score), score.shape)
    return (iy + SEARCH_Y[0], ix + SEARCH_X[0], float(score[iy, ix]))


def bilinear(img: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = ys - y0
    fx = xs - x0
    y0 = np.clip(y0, 0, img.shape[0] - 2)
    x0 = np.clip(x0, 0, img.shape[1] - 2)
    return ((1 - fy) * (1 - fx) * img[y0, x0]
            + (1 - fy) * fx * img[y0, x0 + 1]
            + fy * (1 - fx) * img[y0 + 1, x0]
            + fy * fx * img[y0 + 1, x0 + 1])


def lk_refine(ref: np.ndarray, patch: np.ndarray, r: float, c: float,
              iters: int = 12):
    """Subpixel (dy, dx) minimizing ||ref(x + d) - patch||^2 from the
    integer-aligned start (r, c) by Gauss-Newton on bilinear samples."""
    gy, gx = np.gradient(patch)
    A = np.stack([gy.ravel(), gx.ravel()], axis=1)
    H = A.T @ A
    Hinv = np.linalg.inv(H + 1e-9 * np.eye(2))
    yy, xx = np.mgrid[0:PATCH, 0:PATCH].astype(np.float64)
    dy = dx = 0.0
    for _ in range(iters):
        s = bilinear(ref, yy + r + dy, xx + c + dx)
        err = (s - patch).ravel()
        step = Hinv @ (A.T @ err)
        dy -= step[0]
        dx -= step[1]
        if abs(step[0]) < 1e-4 and abs(step[1]) < 1e-4:
            break
    return dy, dx


def register_pair(f1: np.ndarray, f2: np.ndarray):
    """Patchwise shifts of frame2 content located in frame1 (content moves
    LEFT as the camera moves +x; dx below is frame1_col - frame2_col >= 0 =
    the disparity f/Z). Returns arrays (dx, dy, ncc)."""
    out = []
    h, w = f2.shape
    for r0 in range(0, h - PATCH, STRIDE):
        for c0 in range(0, w - PATCH, STRIDE):
            patch = f2[r0:r0 + PATCH, c0:c0 + PATCH]
            if patch.std() < MIN_STD:
                continue
            hit = ncc_search(f1, patch, r0, c0)
            if hit is None or hit[2] < MIN_NCC:
                continue
            iy, ix, ncc = hit
            sy, sx = lk_refine(f1, patch, r0 + iy, c0 + ix)
            out.append((-(ix + sx), iy + sy, ncc))
    dx, dy, ncc = (np.asarray(v) for v in zip(*out))
    return -dx, dy, ncc       # dx>0 = disparity (content moved left)


def selftest():
    """Estimator precision on a known synthetic shift (reported so the
    ~0.05 px claims are backed by a calibrated instrument)."""
    rng = np.random.default_rng(0)
    base = rng.normal(size=(400, 500))
    # band-limit so bilinear shifting is representative of images
    k = np.hanning(9)
    k = np.outer(k, k)
    k /= k.sum()
    from numpy.fft import irfft2, rfft2

    def conv(a):
        pad = np.zeros_like(base)
        pad[:9, :9] = k
        return np.real(irfft2(rfft2(a) * rfft2(pad), s=a.shape))

    img = conv(base) * 40 + 128
    true = (3.375, -0.221)    # (dx, dy) true shift of content
    yy, xx = np.mgrid[0:400, 0:500].astype(np.float64)
    # content moves RIGHT by dx: shifted(x) = img(x - dx), so the search
    # in img finds the patch at offset -dx (ncc offsets are img-relative)
    shifted = bilinear(img, yy + true[1], xx - true[0])
    errs = []
    for r0 in range(60, 300, 48):
        for c0 in range(60, 380, 48):
            patch = shifted[r0:r0 + PATCH, c0:c0 + PATCH]
            hit = ncc_search(img, patch, r0, c0)
            if hit is None:
                continue
            iy, ix, _ = hit
            sy, sx = lk_refine(img, patch, r0 + iy, c0 + ix)
            errs.append(((ix + sx) - (-true[0]), (iy + sy) - true[1]))
    errs = np.abs(np.asarray(errs))
    print(f"selftest: |dx err| p50={np.median(errs[:,0]):.4f} "
          f"max={errs[:,0].max():.4f} px; |dy err| "
          f"p50={np.median(errs[:,1]):.4f} max={errs[:,1].max():.4f} px")
    return float(np.median(errs))


def measure_alignment():
    frames = [load(f"{TSUKUBA}/{i}.jpg") for i in range(1, 6)]
    print("== (a) patchwise subpixel registration, consecutive pairs ==")
    print("pair  n    disparity range   |frac(dx)| p50/p90      |dy| p50/p90")
    rows = []
    for i in range(4):
        dx, dy, ncc = register_pair(frames[i], frames[i + 1])
        frac = np.abs(dx - np.round(dx))
        row = dict(
            pair=f"{i+1}->{i+2}", n=len(dx),
            dx_min=float(dx.min()), dx_max=float(dx.max()),
            frac_p50=float(np.median(frac)),
            frac_p90=float(np.percentile(frac, 90)),
            dy_p50=float(np.median(np.abs(dy))),
            dy_p90=float(np.percentile(np.abs(dy), 90)),
        )
        rows.append(row)
        print(f"{row['pair']}  {row['n']:3d}  [{row['dx_min']:6.2f},"
              f"{row['dx_max']:7.2f}] px   {row['frac_p50']:.3f}/"
              f"{row['frac_p90']:.3f} px        {row['dy_p50']:.3f}/"
              f"{row['dy_p90']:.3f} px")
    return rows


def ab_tracker():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from mvslam_tpu.frontend.vo_jit import (
        VoJitParams, make_vo_replay, vo_init_state,
    )
    from mvslam_tpu.io import load_image_grayscale
    from mvslam_tpu.ops.camera import PinholeCamera

    cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
    K_inv = jnp.asarray(np.linalg.inv(np.asarray(cam.K)), jnp.float32)
    focal = jnp.asarray(350.0, jnp.float32)
    imgs = jnp.stack([
        jnp.asarray(load_image_grayscale(f"{TSUKUBA}/{i}.jpg"))
        for i in range(1, 6)
    ])
    gt = np.stack([np.arange(5.0), np.zeros(5), np.zeros(5)], 1)
    print("== (b) fused-tracker A/B: subpixel (KLT) vs integer corners ==")
    results = {}
    for name, params in [
        ("subpixel-klt", VoJitParams()),
        ("integer-orb", VoJitParams(use_klt=False)),
    ]:
        replay = make_vo_replay(params)
        state, outs = replay(vo_init_state(params), imgs, K_inv, focal)
        jax.block_until_ready(state.pose_t)
        t = np.asarray(outs.pose_t)
        ok = np.asarray(outs.success).astype(bool)
        per = np.abs(t - gt).max(axis=1)
        ate = float(per[ok].max()) if ok.any() else float("inf")
        results[name] = dict(
            tracked=int(state.frame_tracked), ate_max=ate,
            per_frame=[None if not ok[i] else float(per[i])
                       for i in range(5)],
        )
        per_s = " ".join("--" if v is None else f"{v:.4f}"
                         for v in results[name]["per_frame"])
        print(f"{name:13s} tracked {results[name]['tracked']}/5  "
              f"ate_max {ate:.4f}  per-frame [{per_s}]")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ab", action="store_true",
                    help="skip the tracker A/B (registration only)")
    ap.add_argument("--skip-registration", action="store_true")
    args = ap.parse_args()
    selftest()
    if not args.skip_registration:
        measure_alignment()
    if not args.skip_ab:
        ab_tracker()


if __name__ == "__main__":
    main()
