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
    """HDR export: Radiance RGBE `.hdr` (stb_image_write parity) or a raw
    float32 `.npy` dump."""
    if path.endswith(".hdr"):
        save_radiance_hdr(path, image)
    else:
        np.save(path, np.asarray(image, np.float32))


def save_radiance_hdr(path: str, image) -> None:
    """Write a Radiance RGBE .hdr file (flat, non-RLE scanlines).

    The shared-exponent encoding matches stb_image_write's: e = exponent of
    max(r, g, b); mantissas quantized to 8 bits.  Readable by stb_image,
    imageio, PIL-HDR, Blender, etc."""
    img = np.asarray(image, np.float32)
    if img.ndim != 3 or img.shape[2] < 3:
        raise ValueError("save_radiance_hdr expects (H, W, >=3)")
    h, w = img.shape[:2]
    rgb = np.maximum(img[..., :3], 0.0)
    mx = rgb.max(axis=-1)
    # frexp: mx = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(mx)
    scale = np.where(mx > 1e-32, (256.0 * m / np.maximum(mx, 1e-32)), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(mx > 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n")
        f.write(b"FORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_radiance_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr (flat or RLE scanlines) to float32 (H, W, 3)."""
    data = open(path, "rb").read()
    # Header ends at the first blank line; next line is the resolution.
    end = data.find(b"\n\n")
    if end < 0:
        raise ValueError("not a Radiance HDR file")
    pos = end + 2
    nl = data.find(b"\n", pos)
    dims = data[pos:nl].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation {dims!r}")
    h, w = int(dims[1]), int(dims[3])
    pos = nl + 1
    raw = np.frombuffer(data, np.uint8, offset=pos)
    rgbe = np.zeros((h, w, 4), np.uint8)

    def _is_adaptive(p2):
        # Adaptive-RLE scanline header: 0x02 0x02 then big-endian width;
        # only legal for widths 8..32767 (Radiance spec).
        return (
            8 <= w <= 32767
            and p2 + 4 <= len(raw)
            and raw[p2] == 2 and raw[p2 + 1] == 2
            and ((int(raw[p2 + 2]) << 8) | int(raw[p2 + 3])) == w
        )

    # Fast path: pure flat file (no adaptive headers, no old-style run
    # markers) — trailing bytes after h*w*4 are tolerated (ADVICE r2: exact
    # whole-file length match rejected valid files).
    if len(raw) >= h * w * 4 and not _is_adaptive(0):
        flat = raw[: h * w * 4].reshape(-1, 4)
        old_marks = (flat[:, 0] == 1) & (flat[:, 1] == 1) & (flat[:, 2] == 1)
        if not old_marks.any():
            rgbe = flat.reshape(h, w, 4)
            flat = None
        else:
            flat = True
    else:
        flat = True
    if flat is not None:
        # Per-scanline decode: each line is adaptive RLE, old-style RLE
        # (repeat markers (1,1,1,count), legal for any width), or flat.
        p2 = 0
        for y in range(h):
            if _is_adaptive(p2):
                p2 += 4
                for c in range(4):
                    x = 0
                    while x < w:
                        n = int(raw[p2]); p2 += 1
                        if n > 128:  # run
                            rgbe[y, x : x + n - 128, c] = raw[p2]
                            p2 += 1
                            x += n - 128
                        else:  # literal
                            rgbe[y, x : x + n, c] = raw[p2 : p2 + n]
                            p2 += n
                            x += n
            else:
                x = 0
                shift = 0
                while x < w:
                    if p2 + 4 > len(raw):
                        raise ValueError("truncated HDR scanline")
                    px = raw[p2 : p2 + 4]; p2 += 4
                    if px[0] == 1 and px[1] == 1 and px[2] == 1:
                        if x == 0 and y == 0:
                            raise ValueError("HDR old-style run with no prior pixel")
                        count = int(px[3]) << shift
                        prev = rgbe[y, x - 1] if x > 0 else rgbe[y - 1, w - 1]
                        rgbe[y, x : x + count] = prev
                        x += count
                        shift += 8
                    else:
                        rgbe[y, x] = px
                        x += 1
                        shift = 0
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * np.where(
        e[..., None] > 0, 1.0, 0.0
    )


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0


def export_filename(base: str, spp: int, seconds: float) -> str:
    """Reference-style name embedding spp and render time (Editor.cpp:795)."""
    return f"{base}_{spp}spp_{seconds:.1f}s.png"
