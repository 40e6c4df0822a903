"""Tonemapping: ACES (fitted) and AGX, with exposure/gamma.

Port of PostProcess/Tonemap.slang.  The reference applies, in order:
color = ACESFitted((input + bloom) * exposure) ^ (1/gamma)… — note the actual
kernel (Tonemap.slang:168-175) does exposure, then gamma, then ACES; we keep
that exact order for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

# ACES matrices (Tonemap.slang:20-33)
_ACES_INPUT = jnp.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    jnp.float32,
)
_ACES_OUTPUT = jnp.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    jnp.float32,
)


def _rrt_odt_fit(v):
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return a / b


def aces_fitted(color):
    """ACESFitted (Tonemap.slang:42-55); color (..., 3)."""
    c = color @ _ACES_INPUT.T
    c = _rrt_odt_fit(c)
    c = c @ _ACES_OUTPUT.T
    return jnp.clip(c, 0.0, 1.0)


# AGX (Tonemap.slang:57-157)
_AGX_MAT = jnp.array(
    [
        [0.842479062253094, 0.0423282422610123, 0.0423756549057051],
        [0.0784335999999992, 0.878468636469772, 0.0784336],
        [0.0792237451477643, 0.0791661274605434, 0.879142973793104],
    ],
    jnp.float32,
)
_AGX_MAT_INV = jnp.array(
    [
        [1.19687900512017, -0.0528968517574562, -0.0529716355144438],
        [-0.0980208811401368, 1.15190312990417, -0.0980434501171241],
        [-0.0990297440797205, -0.0989611768448433, 1.15107367264116],
    ],
    jnp.float32,
)


def _agx_contrast(x):
    x2 = x * x
    x4 = x2 * x2
    x6 = x4 * x2
    return (
        -17.86 * x6 * x
        + 78.01 * x6
        - 126.7 * x4 * x
        + 92.06 * x4
        - 28.72 * x2 * x
        + 4.361 * x2
        - 0.1718 * x
        + 0.002857
    )


def agx_tonemap(color, look: str = "default"):
    """AGX with optional golden/punchy looks (Tonemap.slang:79-157)."""
    val = color @ _AGX_MAT  # mul(val, mat) = val as row vector
    min_ev = -12.47393
    max_ev = 4.026069
    val = jnp.clip(jnp.log2(jnp.maximum(val, 1e-10)), min_ev, max_ev)
    val = (val - min_ev) / (max_ev - min_ev)
    val = _agx_contrast(val)

    if look == "golden":
        slope, power, sat = jnp.array([1.0, 0.9, 0.5]), jnp.array([0.8] * 3), 0.8
    elif look == "punchy":
        slope, power, sat = jnp.array([1.0] * 3), jnp.array([1.35] * 3), 1.4
    else:
        slope, power, sat = jnp.array([1.0] * 3), jnp.array([1.0] * 3), 1.0
    val = jnp.power(jnp.maximum(val * slope, 0.0), power)
    lw = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    luma = jnp.sum(val * lw, axis=-1, keepdims=True)
    val = luma + sat * (val - luma)

    val = val @ _AGX_MAT_INV
    return jnp.power(jnp.maximum(val, 0.0), 2.2)


def tonemap(image, bloom=None, exposure=1.0, gamma=2.2, mode: str = "aces"):
    """Full tonemap pass (Tonemap.slang:159-176): (H, W, 3) -> [0,1]."""
    c = image
    if bloom is not None:
        c = c + bloom
    c = c * exposure
    c = jnp.power(jnp.maximum(c, 0.0), 1.0 / gamma)
    if mode == "aces":
        c = aces_fitted(c)
    elif mode.startswith("agx"):
        look = mode.split(":")[1] if ":" in mode else "default"
        c = jnp.clip(agx_tonemap(c, look), 0.0, 1.0)
    else:
        c = jnp.clip(c, 0.0, 1.0)
    return c
