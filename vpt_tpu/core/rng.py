"""Counter-based / carried-state PCG random numbers.

The reference renderer drives all Monte-Carlo decisions from a per-pixel
stateful 32-bit PCG hash (reference: PathTracer/Shaders/Sampler.slang:4-43,
seeded per pixel in RayGen.slang:28).  On TPU we keep the same generator but
carry its 32-bit state explicitly through the wavefront state SoA, which is
jit-pure and shard-safe: seeding is a pure function of
(pixel index, sample index, frame seed), so a sharded render draws the same
numbers as a single-chip render for the same pixel.

All functions are shape-polymorphic: `state` is a uint32 array of any shape
and draws are elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp

_UINT_MAX_F = 4294967295.0


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """One round of the PCG-RXS-M-XS-32 output hash (Jarzynski & Olano 2020).

    Matches the reference's PCG_HASH (Sampler.slang:4-9) so that sampler
    statistics line up.
    """
    x = x.astype(jnp.uint32)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def seed(pixel_index: jnp.ndarray, sample_index, frame_seed) -> jnp.ndarray:
    """Initial per-ray RNG state.

    Decorrelated across pixel, sample-within-frame and frame by hash-chaining,
    mirroring the reference's `Sampler(pixel + Seed)` with a fresh per-dispatch
    Seed (PathTracer.cpp pushes PCG(time) each dispatch).
    """
    s = pcg_hash(jnp.asarray(sample_index, jnp.uint32) ^ jnp.uint32(0x9E3779B9))
    f = pcg_hash(jnp.asarray(frame_seed, jnp.uint32) + s)
    return pixel_index.astype(jnp.uint32) + f


def next_uint(state: jnp.ndarray):
    """Advance the generator; returns (new_state, uint32 draw = new_state)."""
    new = pcg_hash(state)
    return new, new


def next_float(state: jnp.ndarray):
    """Uniform float in [0, 1): (new_state, draw). Matches hash/UINT_MAX."""
    new, bits = next_uint(state)
    return new, bits.astype(jnp.float32) / jnp.float32(_UINT_MAX_F)


def next_float2(state: jnp.ndarray):
    state, x1 = next_float(state)
    state, x2 = next_float(state)
    return state, jnp.stack([x1, x2], axis=-1)


def next_float3(state: jnp.ndarray):
    state, x1 = next_float(state)
    state, x2 = next_float(state)
    state, x3 = next_float(state)
    return state, jnp.stack([x1, x2, x3], axis=-1)


def next_float_range(state: jnp.ndarray, a: float, b: float):
    state, u = next_float(state)
    return state, u * (b - a) + a
