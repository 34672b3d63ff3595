"""Native (C++/libjpeg) loader tests: decode parity with PIL + prefetch order."""

import os

import numpy as np
import pytest

from mvslam_tpu.io import load_image_grayscale, native_loader

TSUKUBA = "/root/reference/data/tsukuba"

pytestmark = pytest.mark.skipif(
    not native_loader.available() or not os.path.isdir(TSUKUBA),
    reason="native loader or tsukuba data unavailable",
)


def test_decode_matches_pil():
    path = f"{TSUKUBA}/1.jpg"
    ours = native_loader.decode_jpeg_gray(path)
    pil = np.asarray(load_image_grayscale(path))
    assert ours.shape == pil.shape == (288, 384)
    # PIL uses ITU-R 601-2 luma on RGB; libjpeg grayscale uses its own
    # coefficients — allow small differences
    assert np.abs(ours - pil).mean() < 0.02
    assert np.abs(ours - pil).max() < 0.2


def test_prefetch_delivers_in_order():
    paths = [f"{TSUKUBA}/{i}.jpg" for i in (1, 2, 3, 4, 5)]
    with native_loader.PrefetchLoader(paths, queue_depth=2, threads=3) as it:
        got = list(it)
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    for _, img in got:
        assert img.shape == (288, 384)
        assert 0.0 <= img.min() and img.max() <= 1.0
    # frames match direct decode
    direct = native_loader.decode_jpeg_gray(paths[2])
    np.testing.assert_array_equal(got[2][1], direct)


def test_missing_file_raises():
    with pytest.raises(IOError):
        native_loader.decode_jpeg_gray("/nonexistent/file.jpg")
