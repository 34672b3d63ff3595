"""Feature detection/description/matching tests.

Synthetic-pattern sanity tests plus the first real-data integration: ORB
features on the bundled tsukuba pair, matched and fed through sfm_solve —
the reference validates `T_pair_to_base ~ unit x-translation`
(``test/test-image-pair.cpp:36-46``; consecutive tsukuba frames are 1 unit
apart in +x by construction).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.io import load_image_grayscale
from mvslam_tpu.ops import features, matching, sfm
from mvslam_tpu.ops.camera import PinholeCamera

TSUKUBA = "/root/reference/data/tsukuba"
F32 = jnp.float32


def checkerboard(h=128, w=160, sq=16):
    """Grid of isolated bright squares (L-corners; FAST-9 cannot fire on
    perfect X-corners of a true checkerboard — the same-sign arcs are only
    8 long)."""
    y = np.arange(h)[:, None] % (2 * sq)
    x = np.arange(w)[None, :] % (2 * sq)
    img = ((y < sq) & (x < sq)).astype(np.float32)
    return jnp.asarray(img)


def test_fast_score_finds_corners():
    img = checkerboard()
    score = features.fast_score(img, 20.0 / 255.0)
    score = features.nms3x3(score)
    n = int(jnp.sum(score > 0))
    assert n >= 40  # 4 corners per square x ~20 squares
    # uniform image -> no corners
    flat = jnp.full((64, 64), 0.5, F32)
    assert int(jnp.sum(features.fast_score(flat, 20.0 / 255.0) > 0)) == 0


def test_box_sum_matches_naive():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(17, 23)).astype(np.float32))
    got = features._box_sum(img, 2)
    padded = np.pad(np.asarray(img), 2)
    want = np.zeros((17, 23), np.float32)
    for i in range(17):
        for j in range(23):
            want[i, j] = padded[i : i + 5, j : j + 5].sum()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_orb_detect_shapes_and_masks():
    img = checkerboard(192, 256, 24)
    fs = features.orb_detect(img, features.OrbParams(max_features=128))
    assert fs.xy.shape == (128, 2)
    assert fs.desc.shape == (128, 8) and fs.desc.dtype == jnp.uint32
    n = int(jnp.sum(fs.mask))
    assert n >= 20
    # valid keypoints stay inside the image
    xy = np.asarray(fs.xy)[np.asarray(fs.mask)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 256).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 192).all()


def test_orb_batched_layout_parity():
    """The (L, H, W) canvas-batched pyramid layout must produce EXACTLY the
    features of the per-level unrolled layout (``OrbParams.batched`` is an
    A/B perf switch, not a semantics switch) — on a real frame, across
    mask, xy, octave, angle, and descriptors."""
    img = jnp.asarray(load_image_grayscale(f"{TSUKUBA}/1.jpg"), F32)
    base = features.OrbParams(max_features=256)
    f_u = features.orb_detect(img, base._replace(batched=False))
    f_b = features.orb_detect(img, base._replace(batched=True))
    np.testing.assert_array_equal(np.asarray(f_u.mask), np.asarray(f_b.mask))
    sel = np.asarray(f_u.mask)
    np.testing.assert_array_equal(np.asarray(f_u.xy)[sel],
                                  np.asarray(f_b.xy)[sel])
    np.testing.assert_array_equal(np.asarray(f_u.octave)[sel],
                                  np.asarray(f_b.octave)[sel])
    np.testing.assert_allclose(np.asarray(f_u.angle)[sel],
                               np.asarray(f_b.angle)[sel], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_u.desc)[sel],
                                  np.asarray(f_b.desc)[sel])


def test_descriptor_stability_under_shift():
    """Same content shifted -> matched descriptors nearly identical."""
    rng = np.random.default_rng(1)
    base = rng.uniform(size=(160, 200)).astype(np.float32)
    # smooth it so FAST fires on blobs, not noise
    img_np = np.asarray(features._box_sum(jnp.asarray(base), 2)) / 25.0
    img1 = jnp.asarray(img_np[8:136, 8:168])
    img2 = jnp.asarray(img_np[8 + 4 : 136 + 4, 8 + 6 : 168 + 6])  # shift (6, 4)
    p = features.OrbParams(max_features=64, num_levels=3)
    f1 = features.orb_detect(img1, p)
    f2 = features.orb_detect(img2, p)
    m = matching.match_features(f1.desc, f1.mask, f2.desc, f2.mask,
                                max_distance=60)
    ok = np.asarray(m.mask)
    assert ok.sum() >= 10
    # matched keypoints should be displaced by ~(-6, -4)
    d = np.asarray(f2.xy)[np.asarray(m.idx)[ok]] - np.asarray(f1.xy)[ok]
    med = np.median(d, axis=0)
    assert abs(med[0] + 6) < 1.5 and abs(med[1] + 4) < 1.5


def test_hamming_matrix_identities():
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32))
    D = matching.hamming_matrix(d, d)
    assert D.shape == (16, 16)
    assert (np.diag(np.asarray(D)) == 0).all()
    # against complement: distance 256
    comp = jnp.asarray(~np.asarray(d))
    Dc = matching.hamming_matrix(d, comp)
    assert (np.diag(np.asarray(Dc)) == 256).all()
    # symmetry + agreement with numpy popcount
    a = np.asarray(d)
    want01 = bin(int(a[0, 0]) ^ int(a[1, 0])).count("1")
    total = sum(
        bin(int(a[0, k]) ^ int(a[1, k])).count("1") for k in range(8)
    )
    assert int(D[0, 1]) == total and want01 <= total


@pytest.mark.skipif(not os.path.isdir(TSUKUBA), reason="tsukuba data absent")
class TestTsukuba:
    def test_feature_extraction_nonempty(self):
        img = load_image_grayscale(f"{TSUKUBA}/1.jpg")
        assert img.shape == (288, 384)
        fs = features.orb_detect(img, features.OrbParams(max_features=512))
        assert int(jnp.sum(fs.mask)) > 300

    def test_pair_reconstruction_unit_x(self):
        # reference test-image-pair.cpp:36-46 — consecutive frames are
        # 1 unit apart in +x; reconstruction gives a unit-norm translation
        # whose direction must be +x, with small rotation
        img1 = load_image_grayscale(f"{TSUKUBA}/1.jpg")
        img2 = load_image_grayscale(f"{TSUKUBA}/2.jpg")
        p = features.OrbParams(max_features=512)
        f1 = features.orb_detect(img1, p)
        f2 = features.orb_detect(img2, p)
        m = matching.match_features(f1.desc, f1.mask, f2.desc, f2.mask,
                                    max_distance=64)
        assert int(jnp.sum(m.mask)) >= 50
        cam = PinholeCamera.load_from_file(f"{TSUKUBA}/camera.config")
        r1 = cam.normalize_points(f1.xy)
        r2 = cam.normalize_points(f2.xy[m.idx])
        res = sfm.sfm_solve(
            r1, r2, m.mask, jax.random.PRNGKey(0),
            sfm.SfmParams(num_hypotheses=512, threshold_sq=5e-2 / (350.0 * 350.0)),
        )
        assert bool(res.success)
        t = np.asarray(res.pose2in1.t)
        # +x direction dominant (the analytic ground truth direction)
        assert t[0] > 0.97, t
        # rotation close to identity
        w = np.asarray(res.pose2in1.log())[3:]
        assert np.abs(w).max() < 0.05, w


@pytest.mark.slow
def test_orb_pallas_dense_parity():
    """The fused Pallas corner front must reproduce the XLA composition's
    features exactly (interpret mode here — the compiled kernel is
    TPU-only; the on-chip A/B lives in tools/pallas_fast.py).

    Textured random image, not the checkerboard: identical corners tie in
    Harris rank, and the fused kernel's ~1e-7 summation-order drift can
    reorder exact ties in top_k (not a semantics difference)."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(np.asarray(
        features._box_sum(jnp.asarray(
            rng.uniform(size=(96, 128)).astype(np.float32)), 2)) / 25.0)
    base = features.OrbParams(max_features=64, num_levels=3)
    f_x = features.orb_detect(img, base)
    f_p = features.orb_detect(
        img, base._replace(pallas_dense=True, pallas_interpret=True)
    )
    np.testing.assert_array_equal(np.asarray(f_x.mask), np.asarray(f_p.mask))
    sel = np.asarray(f_x.mask)
    np.testing.assert_array_equal(np.asarray(f_x.xy)[sel],
                                  np.asarray(f_p.xy)[sel])
    np.testing.assert_array_equal(np.asarray(f_x.desc)[sel],
                                  np.asarray(f_p.desc)[sel])
