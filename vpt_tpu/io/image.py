"""Image export/import: PNG (LDR) and NPY/EXR-style HDR dumps.

The reference exports tonemapped RGBA8 PNGs via stb_image_write
(Editor.cpp:815-843, filename embeds spp + seconds).  We add HDR dumps of the
raw accumulation buffer, which the reference lacks.
"""

from __future__ import annotations

import numpy as np


def save_png(path: str, image) -> None:
    """image: (H, W, 3|4) float in [0,1] or uint8."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def save_hdr(path: str, image) -> None:
    """Raw float32 radiance dump (.npy)."""
    np.save(path, np.asarray(image, np.float32))


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0


def export_filename(base: str, spp: int, seconds: float) -> str:
    """Reference-style name embedding spp and render time (Editor.cpp:795)."""
    return f"{base}_{spp}spp_{seconds:.1f}s.png"
