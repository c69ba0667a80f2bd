"""Framebuffer conversion + image IO.

The reference presents through an R8G8B8A8 swapchain (DXRTRenderer.cpp:181);
the TPU framework's display surface is a plain (H, W, 3) array converted to
u8 and written as PNG (the checkpoint/save capability the reference's
File->Save menu stub never implemented, DXRTMainWindow.cpp:155-158).
"""

from __future__ import annotations

import numpy as np


def to_u8(img) -> np.ndarray:
    """Clamp [0,1] float image to uint8 (UNORM-style round-to-nearest)."""
    arr = np.asarray(img, dtype=np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img) -> None:
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_u8(arr)
    from PIL import Image

    Image.fromarray(arr).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))
