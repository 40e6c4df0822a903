"""Bloom: threshold extraction + box down/upsample mip chain.

Port of PostProcess/BloomDownSample.slang + BloomUpSample.slang and the host
orchestration in PostProcessor.cpp:199-247 (up to 10 mip levels, each half
resolution; additive upsample back to full res).  Pure XLA ops — the 4x4 box
filters lower to fused convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.maximum(e1 - e0, 1e-8), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def threshold_extract(image, bloom_threshold, falloff_range):
    """First dispatch: smoothstep brightness window (BloomDownSample.slang:32-45)."""
    lw = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    brightness = jnp.sum(image * lw, axis=-1, keepdims=True)
    factor = smoothstep(bloom_threshold - falloff_range, bloom_threshold + falloff_range, brightness)
    return image * factor


def _box4_gather(image, coords_y, coords_x):
    return image[coords_y, coords_x]


def downsample(image, strength):
    """4x4 clamped box downsample to half res ×strength
    (BloomDownSample.slang:46-63: samples at 2*p + (-2..1))."""
    h, w = image.shape[0], image.shape[1]
    oh, ow = max(h // 2, 1), max(w // 2, 1)
    ys = jnp.arange(oh) * 2
    xs = jnp.arange(ow) * 2
    acc = jnp.zeros((oh, ow, image.shape[2]), image.dtype)
    for dy in range(-2, 2):
        for dx in range(-2, 2):
            yy = jnp.clip(ys + dy, 0, h - 1)
            xx = jnp.clip(xs + dx, 0, w - 1)
            acc = acc + image[yy[:, None], xx[None, :]]
    return acc / 25.0 * strength  # /= (2*2+1)^2, exactly as the shader


def upsample_add(low, high, strength):
    """4x4 box upsample of `low` added into `high`
    (BloomUpSample.slang:31-48: samples at p/2 + (-2..1) + 1)."""
    h, w = high.shape[0], high.shape[1]
    lh, lw_ = low.shape[0], low.shape[1]
    ys = jnp.arange(h) // 2
    xs = jnp.arange(w) // 2
    acc = jnp.zeros_like(high)
    for dy in range(-2, 2):
        for dx in range(-2, 2):
            yy = jnp.clip(ys + dy + 1, 0, lh - 1)
            xx = jnp.clip(xs + dx + 1, 0, lw_ - 1)
            acc = acc + low[yy[:, None], xx[None, :]]
    return high + acc / 25.0 * strength


def bloom(image, threshold=1.5, strength=0.5, falloff_range=0.5, mip_levels=10):
    """Full bloom chain (PostProcessor.cpp:199-232).

    Returns the bloom image at full resolution (add it to the input before
    tonemapping, weighted as in Tonemap.slang:169).
    """
    h, w = image.shape[0], image.shape[1]
    levels = []
    base = threshold_extract(image, threshold, falloff_range)
    cur = base
    size = min(h, w)
    n = 0
    while size >= 2 and n < mip_levels:
        cur = downsample(cur, strength)
        levels.append(cur)
        size //= 2
        n += 1
    if not levels:
        return base
    acc = levels[-1]
    for lvl in reversed(levels[:-1]):
        acc = upsample_add(acc, lvl, strength)
    # Final upsample adds into the thresholded full-res image — mip 0 of the
    # reference's chain (BloomDownSample FirstDispatch writes BloomViews[0],
    # BloomUpSample accumulates into it, Tonemap.slang:169 reads it).
    return upsample_add(acc, base, strength)
