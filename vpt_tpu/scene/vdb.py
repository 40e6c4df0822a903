"""Volume grid ingestion + procedural generators.

The reference ingests OpenVDB files through NanoVDB
(PathTracer.cpp:1347-1516) — a native dependency this environment doesn't
ship.  Dense (D, H, W) float32 bricks are our device format (sampled in
vpt_tpu.render.volumes exactly like the reference samples the NanoVDB tree,
including the +-1 voxel jitter); this module provides:

* `load_grid` — .npy/.npz dense grids; .vdb files raise with instructions to
  pre-convert (e.g. `openvdb` offline: grid -> dense -> np.save);
* procedural fbm clouds / smoke plumes for tests, demos and benchmarks.
"""

from __future__ import annotations

import numpy as np


def load_grid(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    if path.endswith(".npz"):
        d = np.load(path)
        key = "density" if "density" in d else list(d.keys())[0]
        return np.asarray(d[key], np.float32)
    if path.endswith(".vdb"):
        # Native OpenVDB ingestion (pure-Python parser; reference:
        # PathTracer.cpp:1347-1516 via NanoVDB).
        from vpt_tpu.scene.vdb_reader import read_vdb

        return read_vdb(path).values
    if path.endswith(".nvdb"):
        raise NotImplementedError(
            "NanoVDB (.nvdb) is a GPU-baked format; load the source .vdb "
            "instead (vpt_tpu reads OpenVDB directly)."
        )
    raise ValueError(f"unsupported grid format: {path}")


def _value_noise3(shape, freq, rng):
    """Tileable-ish trilinear value noise at integer lattice frequency."""
    d, h, w = shape
    lattice = rng.random((freq + 1, freq + 1, freq + 1)).astype(np.float32)
    zs = np.linspace(0, freq, d, endpoint=False)
    ys = np.linspace(0, freq, h, endpoint=False)
    xs = np.linspace(0, freq, w, endpoint=False)
    z0 = zs.astype(int)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    fz = (zs - z0)[:, None, None]
    fy = (ys - y0)[None, :, None]
    fx = (xs - x0)[None, None, :]

    def g(dz, dy, dx):
        return lattice[np.minimum(z0 + dz, freq)][:, np.minimum(y0 + dy, freq)][
            :, :, np.minimum(x0 + dx, freq)
        ]

    c000, c001 = g(0, 0, 0), g(0, 0, 1)
    c010, c011 = g(0, 1, 0), g(0, 1, 1)
    c100, c101 = g(1, 0, 0), g(1, 0, 1)
    c110, c111 = g(1, 1, 0), g(1, 1, 1)
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def fbm_noise(shape=(64, 64, 64), octaves=4, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = np.zeros(shape, np.float32)
    amp, freq, total = 1.0, 4, 0.0
    for _ in range(octaves):
        out += amp * _value_noise3(shape, freq, rng)
        total += amp
        amp *= 0.5
        freq *= 2
    return out / total


def procedural_cloud(shape=(64, 64, 64), coverage=0.45, seed=0) -> np.ndarray:
    """Puffy cloud: fbm density carved by a squashed-sphere falloff."""
    noise = fbm_noise(shape, octaves=4, seed=seed)
    d, h, w = shape
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, d), np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    r = np.sqrt(x * x + (y * 1.6) ** 2 + z * z)
    shell = np.clip(1.0 - r, 0.0, 1.0)
    dens = np.clip(noise - (1.0 - coverage), 0.0, None) * shell
    m = dens.max()
    return (dens / m if m > 0 else dens).astype(np.float32)


def procedural_smoke_plume(shape=(96, 64, 64), seed=3) -> np.ndarray:
    """Rising plume: radius tapering with height + swirl noise."""
    noise = fbm_noise(shape, octaves=5, seed=seed)
    d, h, w = shape
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, d), np.linspace(0, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    radius = 0.15 + 0.5 * y
    cx = 0.25 * np.sin(4.0 * y)  # wobble
    rr = np.sqrt((x - cx) ** 2 + z * z)
    core = np.clip(1.0 - rr / np.maximum(radius, 1e-3), 0.0, 1.0)
    fade = np.clip(1.2 - y, 0.0, 1.0)
    dens = core * fade * (0.4 + 0.6 * noise)
    m = dens.max()
    return (dens / m if m > 0 else dens).astype(np.float32)
