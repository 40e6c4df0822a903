"""Environment map ingestion: alias-map build + PDF-in-alpha convention.

Vectorized NumPy re-derivation of the reference's env-map preprocessing
(PathTracer.cpp:1137-1332):

* per-texel importance = texel solid angle × max(R, G, B);
* a Walker alias map over texels normalized so the mean importance is 1;
* the alpha channel of the uploaded image stores max(R, G, B) / Σimportance…
  — note the reference stores the *unweighted* brightness over the weighted
  sum; we reproduce that exactly because the MIS weights in
  Miss.slang:67-72 / Sampler.slang:344 consume this quantity as "the PDF".

Also HDR file loading (Radiance .hdr via imageio, .exr/.npy/.npz passthrough).
"""

from __future__ import annotations

import numpy as np

from vpt_tpu.scene.types import EnvMapData


def load_hdr(path: str) -> np.ndarray:
    """Load an HDR/EXR/NPY image as float32 (H, W, 3)."""
    if path.endswith((".npy",)):
        img = np.load(path)
    elif path.endswith(".hdr"):
        # Radiance RGBE via our own decoder (imageio's fallback plugins
        # mis-decode the shared exponent when freeimage is absent).
        from vpt_tpu.io.image import load_radiance_hdr

        img = load_radiance_hdr(path)
    else:
        import imageio.v2 as imageio

        img = imageio.imread(path)
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img[..., :3]


def build_alias_map(importance: np.ndarray):
    """Walker alias map matching the reference's pairing scheme.

    `importance`: flat (N,) nonnegative weights.  Returns (alias, imp) where
    imp is the normalized importance (mean 1) and alias the paired texel.
    """
    n = importance.shape[0]
    total = float(importance.sum())
    if total <= 0.0:
        return np.arange(n, dtype=np.int32), np.zeros(n, np.float32)
    norm = (importance * (n / total)).astype(np.float64)
    alias = np.arange(n, dtype=np.int32)

    # Classic two-stack Vose construction (equivalent to the reference's
    # partition-table sweep, PathTracer.cpp:1239-1283, but O(n) and stable).
    small = list(np.nonzero(norm < 1.0)[0][::-1])
    large = list(np.nonzero(norm >= 1.0)[0][::-1])
    norm = norm.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        alias[s] = l
        norm[l] -= 1.0 - norm[s]
        if norm[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    return alias.astype(np.int32), norm.astype(np.float32)


def prepare_environment(image: np.ndarray) -> EnvMapData:
    """Full env-map preprocess: solid-angle importance, alias map, PDF alpha."""
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    rgb = image[..., :3]

    # Solid angle per row: (cosθ0 - cosθ1) * stepφ  (PathTracer.cpp:1176-1199).
    step_phi = 2.0 * np.pi / w
    theta = np.pi * np.arange(h + 1) / h
    cos_theta = np.cos(theta)
    area = (cos_theta[:-1] - cos_theta[1:]) * step_phi  # (h,)

    brightness = rgb.max(axis=-1)  # max(R, G, B)
    importance = (area[:, None] * brightness).reshape(-1)
    alias, imp = build_alias_map(importance)

    total = float(importance.sum())
    if total > 0:
        pdf = brightness / total
    else:
        pdf = np.zeros_like(brightness)
    out = np.concatenate([rgb, pdf[..., None]], axis=-1).astype(np.float32)

    # 2x2 neighborhoods for single-gather bilinear fetches (wrap-u, clamp-v);
    # skip for very large envs where the 4x duplication would be wasteful.
    if h * w <= 2 * 1024 * 1024:
        xr = np.concatenate([out[:, 1:], out[:, :1]], axis=1)  # x+1 wrapped
        yd = np.concatenate([out[1:], out[-1:]], axis=0)  # y+1 clamped
        ydxr = np.concatenate([yd[:, 1:], yd[:, :1]], axis=1)
        quad = np.concatenate([out, xr, yd, ydxr], axis=-1).astype(np.float32)
    else:
        quad = np.zeros((1, 1, 16), np.float32)
    return EnvMapData(
        image=out, alias_index=alias, alias_importance=imp,
        alias=np.stack([imp, alias.astype(np.float32)], axis=-1),
        quad=quad,
    )


def constant_environment(color=(0.0, 0.0, 0.0), size=(8, 16)) -> EnvMapData:
    """Uniform-radiance environment (handy for furnace tests)."""
    h, w = size
    img = np.zeros((h, w, 3), np.float32)
    img[..., :] = np.asarray(color, np.float32)
    return prepare_environment(img)


def default_sky(size=(64, 128), sun_azimuth=0.35, sun_altitude=0.35, sun_radiance=150.0) -> np.ndarray:
    """Procedural gradient sky with a sun hotspot.

    Stands in for the reference's default `Assets/meadow_2_4k.hdr`
    (PathTracer.h:208), which is not redistributable with the repo.  Used
    whenever a scene provides no environment map, so unlit scenes (e.g.
    VikingRoom.gltf) are lit like they are in the reference.
    """
    h, w = size
    ys = np.linspace(-1.0, 1.0, h)[:, None]  # -1 = up
    up = np.clip(-ys, 0.0, 1.0)
    horizon = 1.0 - np.abs(ys)
    sky = np.zeros((h, w, 3), np.float32)
    sky[..., 0] = 0.25 + 0.35 * horizon + 0.05 * up
    sky[..., 1] = 0.35 + 0.35 * horizon + 0.15 * up
    sky[..., 2] = 0.55 + 0.30 * horizon + 0.35 * up
    # ground hemisphere: dimmer, warm
    ground = ys[:, 0] > 0
    sky[ground] *= np.array([0.45, 0.38, 0.30], np.float32)
    sy = int((0.5 - sun_altitude / 2) * h)
    sx = int((0.5 + sun_azimuth / 2) * w) % w
    sky[max(sy - 1, 0) : sy + 2, max(sx - 1, 0) : sx + 2] = sun_radiance
    return sky
