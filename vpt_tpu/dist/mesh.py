"""Multi-chip rendering: shard the pixel×spp wavefront over an ICI mesh.

The reference is single-GPU; its only "scaling" levers are split-screen
chunking and per-frame sample batching (SURVEY §2.4).  Here scaling is a
first-class component: a 2D `jax.sharding.Mesh` with axes

* ``tile`` — pixels are partitioned across this axis (each chip owns a pixel
  strip; no communication needed),
* ``spp``  — samples are partitioned across this axis and reduced with a
  `psum`-mean over ICI (the distributed analogue of the reference's
  progressive accumulation, RayGen.slang:132-141).

Determinism: RNG seeds are a pure function of (pixel index, sample index),
with sample indices offset by ``spp_coord * local_samples`` — so an
``(T, S)`` mesh render draws exactly the sample set of a single-chip
``n_samples`` render, and results are independent of the mesh shape.

The scene is fully replicated (it is read-only; Sponza-scale scene data is
~100 MB, far below per-chip HBM).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vpt_tpu.render import integrator


def make_mesh(devices: Sequence[jax.Device] | None = None, tile: int | None = None, spp: int = 1) -> Mesh:
    """Build a (tile, spp) device mesh.  Defaults: all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None:
        tile = n // spp
    assert tile * spp == n, f"mesh {tile}x{spp} != {n} devices"
    arr = np.array(devices).reshape(tile, spp)
    return Mesh(arr, ("tile", "spp"))


def pixel_grid(width: int, height: int):
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    pixel_xy = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)
    # Collision-free row-major RNG stream ids (see core/tiling.py).
    pixel_index = (xs.reshape(-1) + width * ys.reshape(-1)).astype(np.uint32)
    return pixel_xy, pixel_index


@functools.lru_cache(maxsize=64)
def _sharded_step(mesh: Mesh, meta, flags, resolution, local_samples: int):
    """One jitted sharded render step, cached on its static configuration.

    Traced args: (scene_data, params, pixel_xy, pixel_index, frame_seed) —
    reusable across bands/frames without recompiling (seeds and pixel
    coordinates are data, not constants)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        # P() / P("tile", ...) are tree-prefixes: the scalar spec replicates
        # the whole scene/params pytrees.
        in_specs=(P(), P(), P("tile", None), P("tile"), P()),
        out_specs=(P("tile", None), P()),
        check_vma=False,
    )
    def shard_fn(scene_local, params_local, pxy, pidx, frame_seed):
        spp_idx = jax.lax.axis_index("spp")
        # Offset sample indices by the chip's spp coordinate so the union over
        # chips is exactly the single-chip sample set [0, n_samples).
        offset = spp_idx.astype(jnp.uint32) * jnp.uint32(local_samples)
        radiance, segs = integrator.render_samples(
            scene_local, meta, flags, params_local, pxy, pidx, resolution,
            frame_seed, local_samples, sample_offset=offset,
        )
        radiance = jax.lax.pmean(radiance, "spp")
        segs = jax.lax.psum(jax.lax.psum(segs, "spp"), "tile")
        return radiance, segs

    return jax.jit(shard_fn)


def _check_samples(n_samples: int, n_spp: int):
    assert n_samples >= n_spp and n_samples % n_spp == 0, (
        f"n_samples ({n_samples}) must be a positive multiple of the spp axis ({n_spp})"
    )


def _pad_pixels(pixel_xy, pixel_index, n_tile: int, n_real_streams: int):
    """Pad the pixel arrays to a tile-axis multiple.  Pad lanes trace real
    (discarded) paths through pixel (0, 0) with RNG stream ids past the
    frame's range, so they perturb nothing and collide with nothing."""
    n = pixel_xy.shape[0]
    pad = (-n) % n_tile
    if pad == 0:
        return pixel_xy, pixel_index, 0
    pixel_xy = np.concatenate(
        [pixel_xy, np.zeros((pad, 2), np.float32)], axis=0
    )
    pixel_index = np.concatenate(
        [pixel_index,
         (n_real_streams + np.arange(pad, dtype=np.uint32)).astype(np.uint32)]
    )
    return pixel_xy, pixel_index, pad


def render_sharded(
    scene_data,
    meta,
    flags,
    params,
    resolution,
    frame_seed,
    n_samples: int,
    mesh: Mesh,
):
    """Render one frame with pixels sharded over ``tile`` and samples over
    ``spp``.  Returns ((H, W, 3) radiance, scalar segment count) with the
    image replicated (tile-gathered) on the host.

    ``n_samples`` is the total spp; it must be divisible by the spp axis.
    """
    width, height = resolution
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    _check_samples(n_samples, n_spp)
    local_samples = n_samples // n_spp

    pixel_xy, pixel_index = pixel_grid(width, height)
    # Non-divisible pixel counts (e.g. 1080-aspect frames on 8-chip meshes)
    # pad to a tile multiple and drop the pad lanes on return.
    pixel_xy, pixel_index, pad = _pad_pixels(
        pixel_xy, pixel_index, n_tile, width * height
    )
    step = _sharded_step(mesh, meta, flags, resolution, local_samples)
    radiance, segs = step(
        scene_data, params, jnp.asarray(pixel_xy), jnp.asarray(pixel_index),
        jnp.uint32(frame_seed),
    )
    if pad:
        radiance = radiance[:-pad]
    return radiance.reshape(height, width, 3), segs


def render_tiled_final_frame(
    scene_data, meta, flags, params, resolution, n_samples, mesh,
    tile_rows: int = 4, frame_seed: int = 1234,
):
    """High-res / high-spp final frame: host-side loop over row bands, each
    band rendered sharded (the TPU analogue of the reference's split-screen
    chunking, PathTracer.cpp:141-152, which bounds per-dispatch device time).

    All bands share ONE compiled executable: band pixel coordinates and the
    frame seed are traced arguments of the cached sharded step.
    """
    width, height = resolution
    band_h = -(-height // tile_rows)  # ceil: last band may be short
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    _check_samples(n_samples, n_spp)
    local_samples = n_samples // n_spp
    step = _sharded_step(mesh, meta, flags, resolution, local_samples)

    out = np.zeros((height, width, 3), np.float32)
    total_segs = 0.0
    for b in range(tile_rows):
        y0 = b * band_h
        ys = np.arange(y0, min(y0 + band_h, height))
        if ys.size == 0:
            break
        xs = np.arange(width)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pixel_xy = np.stack(
            [gx.reshape(-1), gy.reshape(-1)], axis=-1
        ).astype(np.float32)
        pixel_index = (gx.reshape(-1) + width * gy.reshape(-1)).astype(np.uint32)
        # Pad short/non-divisible bands to the FULL band shape so every band
        # reuses one compiled executable, then drop the pad rows.
        n_full = band_h * width
        if pixel_xy.shape[0] < n_full:
            extra = n_full - pixel_xy.shape[0]
            pixel_xy = np.concatenate(
                [pixel_xy, np.zeros((extra, 2), np.float32)]
            )
            pixel_index = np.concatenate(
                [pixel_index,
                 (width * height + np.arange(extra, dtype=np.uint32))]
            )
        pixel_xy, pixel_index, _ = _pad_pixels(
            pixel_xy, pixel_index, n_tile, width * height + n_full
        )
        band, segs = step(
            scene_data, params, jnp.asarray(pixel_xy), jnp.asarray(pixel_index),
            jnp.uint32(frame_seed),
        )
        band = np.asarray(band)[: ys.size * width]
        out[ys[0] : ys[-1] + 1] = band.reshape(ys.size, width, 3)
        total_segs += float(segs)
    return out, total_segs
