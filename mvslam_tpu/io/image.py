"""Host-side image IO and dataset manifests.

Rebuild of the reference's OpenCV-backed image layer (``base/image.{hpp,cpp}``:
``load_image_grayscale``/``save_image`` over cv::imread/imwrite) and the
dataset plumbing in ``utility/`` (``image.txt`` manifest lists,
``os/directory-iterator.{hpp,cpp}``). Decoding happens on host (PIL); the
device sees float32 arrays in [0, 1].
"""

from __future__ import annotations

import os
from typing import Iterator, List

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def load_image_grayscale(path: str, dtype=jnp.float32) -> Array:
    """(H, W) grayscale in [0, 1] (reference ``base/image.cpp:9-15``)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("L"), dtype=np.float32) / 255.0
    return jnp.asarray(arr, dtype)


def load_image_rgb(path: str, dtype=jnp.float32) -> Array:
    """(H, W, 3) RGB in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return jnp.asarray(arr, dtype)


def save_image(path: str, img: Array) -> None:
    """Save [0, 1] float image (grayscale or RGB) via PIL."""
    from PIL import Image

    arr = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


def iter_directory(path: str, extension: str | None = None) -> Iterator[str]:
    """Filenames in a directory filtered by extension, sorted.

    Reference ``DirectoryIterator`` (``os/directory-iterator.cpp:7-85``)
    makes no ordering guarantee; sorting here makes replays deterministic.
    """
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if not os.path.isfile(full):
            continue
        if extension is None or name.lower().endswith(extension.lower()):
            yield full


def read_manifest(manifest_path: str) -> List[str]:
    """``image.txt`` replay manifest: one image path per line, relative
    paths resolved against the manifest's directory (reference
    ``utility/visual-odometer.cpp:78-116``, writer at
    ``utility/video-capture.cpp:74-101``)."""
    base = os.path.dirname(os.path.abspath(manifest_path))
    out = []
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            out.append(
                line if os.path.isabs(line)
                else os.path.normpath(os.path.join(base, line))
            )
    return out


def write_manifest(manifest_path: str, paths: List[str]) -> None:
    base = os.path.dirname(os.path.abspath(manifest_path))
    with open(manifest_path, "w") as f:
        for p in paths:
            rel = os.path.relpath(os.path.abspath(p), base)
            f.write(rel + "\n")
