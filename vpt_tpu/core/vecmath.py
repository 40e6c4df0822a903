"""Small-vector math over SoA arrays of shape (..., 3).

Everything here is elementwise VPU work; keep it branch-free and f32.
Conventions follow the reference renderer: right-handed, Y-up world space,
Z-up tangent space (Material.slang works in tangent space with N = +Z).
"""

from __future__ import annotations

import jax.numpy as jnp

# Guard for exactly-zero vectors only: must stay far below the squared norm
# of any real geometric vector at SMALL scene scales (a 0.01x-scaled Cornell
# light triangle's cross product has |v|^2 ~ 5e-9; an EPS of 1e-8 silently
# shrank its normal and broke the NEE cosine there).
EPS = 1e-30


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def normalize(v):
    return v * jax_rsqrt(jnp.maximum(dot(v, v, keepdims=True), EPS))


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def reflect(i, n):
    """GLSL-style reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    return i - 2.0 * dot(n, i, keepdims=True) * n


def refract(i, n, eta):
    """GLSL-style refract. `eta` is (...,) or (...,1); returns 0 on TIR."""
    eta = jnp.asarray(eta)
    if eta.ndim == i.ndim - 1:
        eta = eta[..., None]
    cosi = -dot(i, n, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    t = eta * i + (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(t), t)


def rotate_axis_angle(v, axis, theta):
    """Rodrigues rotation, matching the reference's Rotate (RTCommon.slang:37-45)."""
    axis = normalize(jnp.broadcast_to(jnp.asarray(axis, v.dtype), v.shape))
    theta = jnp.asarray(theta, v.dtype)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    if c.ndim == v.ndim - 1:
        c = c[..., None]
        s = s[..., None]
    return v * c + cross(axis, v) * s + axis * dot(axis, v, keepdims=True) * (1.0 - c)


def onb_from_z(w):
    """Orthonormal basis with +Z = w, using the reference's up-vector pick
    (Sampler.slang:187-189: up = |w.y| < 1 ? Y : Z, tangent = norm(cross(up, w)))."""
    up = jnp.where(
        (jnp.abs(w[..., 1:2]) < 0.9999999),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], w.dtype), w.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], w.dtype), w.shape),
    )
    t = normalize(cross(up, w))
    b = cross(w, t)
    return t, b


def luminance(rgb):
    """Rec.709 luma as used by the firefly clamp (RayGen.slang:97)."""
    w = jnp.array([0.212671, 0.715160, 0.072169], rgb.dtype)
    return dot(rgb, jnp.broadcast_to(w, rgb.shape))


def direction_to_uv(v):
    """Equirect direction→UV matching RTCommon.slang:129-136.

    u = atan2(x, -z) / (2π) + 0.5, v = asin(y)/π + 0.5.
    """
    gamma = jnp.arcsin(jnp.clip(v[..., 1], -1.0, 1.0))
    theta = jnp.arctan2(v[..., 0], -v[..., 2])
    u = theta * (0.5 / jnp.pi) + 0.5
    vv = gamma * (1.0 / jnp.pi) + 0.5
    return u, vv


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic pdfA²/(pdfA²+pdfB²) (RTCommon.slang:124-127)."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return a2 / jnp.maximum(a2 + b2, 1e-20)


def balance_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


def blackbody_rgb(temperature):
    """Kelvin → RGB (Tanner Helland fit), matching RTCommon.slang:138-172."""
    t = temperature / 100.0
    r = jnp.where(t <= 66.0, 255.0, 329.698727446 * jnp.power(jnp.maximum(t - 60.0, 1e-6), -0.1332047592))
    g = jnp.where(
        t <= 66.0,
        99.4708025861 * jnp.log(jnp.maximum(t, 1e-6)) - 161.1195681661,
        288.1221695283 * jnp.power(jnp.maximum(t - 60.0, 1e-6), -0.0755148492),
    )
    b = jnp.where(
        t >= 66.0,
        255.0,
        jnp.where(t <= 19.0, 0.0, 138.5177312231 * jnp.log(jnp.maximum(t - 10.0, 1e-6)) - 305.0447927307),
    )
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return jnp.clip(rgb, 0.0, 1.0)


def intersect_sphere(origin, direction, center, radius):
    """Ray-sphere; returns (t0, t1), both -1 when missed (RTCommon.slang:174-192)."""
    oc = origin - center
    a = dot(direction, direction)
    b = 2.0 * dot(oc, direction)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    miss = disc < 0.0
    return jnp.where(miss, -1.0, t0), jnp.where(miss, -1.0, t1)
