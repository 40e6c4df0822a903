"""Pixel-order tiling: lay rays out in 8x8 screen tiles.

The cluster intersector (vpt_tpu.accel.cluster) processes rays in packets of
64 consecutive wavefront slots; with row-major pixel order a packet is a
64x1 strip, with 8x8 tiles it is a compact screen square — much more
coherent, so packets visit far fewer clusters.  The reference gets this for
free from the GPU's dispatch swizzling.
"""

from __future__ import annotations

import numpy as np

TILE = 8


def tiled_pixel_order(width: int, height: int):
    """Returns (pixel_xy (N,2) f32, pixel_index (N,) u32, scatter (N,) i64,
    padded (wp, hp)) with rays ordered tile-major.

    `scatter[i]` is the row-major flat index (into the *padded* image) that
    ray `i` writes to; pad pixels simply render off-screen rays whose results
    land in the padded border and are cropped.
    """
    wp = -(-width // TILE) * TILE
    hp = -(-height // TILE) * TILE
    ty, tx = np.meshgrid(np.arange(hp // TILE), np.arange(wp // TILE), indexing="ij")
    iy, ix = np.meshgrid(np.arange(TILE), np.arange(TILE), indexing="ij")
    # (tilesY, tilesX, TILE, TILE)
    px = (tx[:, :, None, None] * TILE + ix[None, None]).reshape(-1)
    py = (ty[:, :, None, None] * TILE + iy[None, None]).reshape(-1)
    pixel_xy = np.stack([px, py], axis=-1).astype(np.float32)
    # RNG stream id.  The reference seeds with y + width*x (RayGen.slang:28),
    # which collides for portrait resolutions (pairs with y1-y2 = width*(x2-x1)
    # share a stream); we use the collision-free row-major x + width*y —
    # only sampler statistics match the reference, not bit patterns.
    pixel_index = (px + width * py).astype(np.uint32)
    scatter = (py.astype(np.int64) * wp + px.astype(np.int64))
    return pixel_xy, pixel_index, scatter, (wp, hp)


def scatter_to_image(radiance, scatter, padded, width: int, height: int):
    """(N, 3) tile-ordered radiance -> (height, width, 3) row-major image."""
    import jax.numpy as jnp

    wp, hp = padded
    flat = jnp.zeros((wp * hp, 3), radiance.dtype).at[scatter].set(radiance)
    return flat.reshape(hp, wp, 3)[:height, :width]
