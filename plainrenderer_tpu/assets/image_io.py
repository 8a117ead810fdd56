"""Texture image IO.

Parity: Plain/src/Common/ImageIO.cpp:17-116 (stb-based loader: PNG/JPEG/HDR,
RGB padded to RGBA) with DDS routed to assets.dds. PIL/imageio replace stb.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import dds


def load_image(path: str | Path) -> np.ndarray:
    """Load an LDR/HDR image as (H, W, 4).

    LDR returns uint8, HDR (.hdr) returns float32 — matching the reference's
    stb paths (ImageIO.cpp:17-116). 3-channel input is padded with opaque
    alpha exactly like the reference's RGB->RGBA expansion.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".dds":
        img = dds.read_dds(path)
        if img.format != "rgba8":
            raise ValueError(f"only rgba8 DDS supported as 2D texture: {path}")
        arr = np.frombuffer(img.data, np.uint8)
        return arr[: img.height * img.width * 4].reshape(img.height, img.width, 4).copy()
    if suffix == ".hdr":
        import imageio.v3 as iio

        arr = iio.imread(path).astype(np.float32)
        return _pad_rgba(arr, fill=1.0)
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGBA")
        return np.asarray(im, np.uint8).copy()


def _pad_rgba(arr: np.ndarray, fill) -> np.ndarray:
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    if c == 4:
        return arr
    out = np.full((h, w, 4), fill, dtype=arr.dtype)
    out[..., :c] = arr
    if c == 1:
        out[..., 1] = out[..., 2] = arr[..., 0]
    return out


def save_image(path: str | Path, image: np.ndarray) -> None:
    """Save (H, W, 3|4) uint8 (screenshots, debug output)."""
    from PIL import Image

    Image.fromarray(np.asarray(image)).save(path)
