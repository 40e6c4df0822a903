"""Importance samplers: directions, microfacets, phase functions.

Branch-free JAX ports of the reference's sampler library
(PathTracer/Shaders/Sampler.slang) with identical math and draw counts, so
sampler statistics (and chi-square tests) line up with the reference.
All samplers thread an explicit uint32 RNG state (see vpt_tpu.core.rng).
"""

from __future__ import annotations

import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import cross, dot, normalize, onb_from_z


def sample_disk(state):
    """Uniform disk via polar coords (Sampler.slang:102-112)."""
    state, u = rng.next_float2(state)
    theta = 2.0 * jnp.pi * u[..., 0]
    r = jnp.sqrt(u[..., 1])
    return state, jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_sphere(state):
    """Uniform sphere (Sampler.slang:114-133)."""
    state, u = rng.next_float2(state)
    theta = 2.0 * jnp.pi * u[..., 0]
    z = 1.0 - 2.0 * u[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return state, jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def sample_cosine_hemisphere(state, normal):
    """Cosine-weighted hemisphere as normalize(sphere + n) (Sampler.slang:135-139)."""
    state, s = sample_sphere(state)
    return state, normalize(s + normal)


def sample_ggx_vndf(state, v, ax, ay):
    """Anisotropic GGX visible-normal sampling (Heitz 2018; Sampler.slang:141-166).

    `v` is the tangent-space view vector (..., 3); `ax`/`ay` broadcast against
    `v[..., 0]`.  Returns the sampled half-vector `ne`.
    """
    state, u = rng.next_float2(state)
    u1, u2 = u[..., 0], u[..., 1]
    ax = jnp.broadcast_to(jnp.asarray(ax, v.dtype), v[..., 0].shape)
    ay = jnp.broadcast_to(jnp.asarray(ay, v.dtype), v[..., 0].shape)
    vh = normalize(jnp.stack([ax * v[..., 0], ay * v[..., 1], jnp.abs(v[..., 2])], axis=-1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1) * inv_len[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], v.dtype), vh.shape),
    )
    t2 = cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh
    )
    ne = normalize(
        jnp.stack([ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], axis=-1)
    )
    return state, ne


def _local_to_world_around(incident, local_dir):
    """Rotate a z-up local sample so +z aligns with `incident`
    (Sampler.slang:186-191 basis choice)."""
    t, b = onb_from_z(incident)
    return normalize(
        local_dir[..., 0:1] * t + local_dir[..., 1:2] * b + local_dir[..., 2:3] * incident
    )


def sample_henyey_greenstein(state, incident, g):
    """HG phase sample (Sampler.slang:168-193)."""
    state, u = rng.next_float2(state)
    g = jnp.asarray(g, jnp.float32)
    g_safe = jnp.where(jnp.abs(g) < 1e-5, 1e-5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u[..., 0])
    cos_g = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-5, 2.0 * u[..., 0] - 1.0, cos_g)
    phi = 2.0 * jnp.pi * u[..., 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return state, _local_to_world_around(incident, local)


def sample_rayleigh(state, incident):
    """Exact inverse-CDF Rayleigh phase sample (Sampler.slang:195-215)."""
    state, u = rng.next_float2(state)
    x = 2.0 * u[..., 0] - 1.0
    w = -jnp.cbrt(2.0 * x + jnp.sqrt(4.0 * x * x + 1.0))
    cos_t = jnp.clip(w - 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w), -1.0, 1.0)
    phi = 2.0 * jnp.pi * u[..., 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return state, _local_to_world_around(incident, local)


def _draine_cos_theta(u1, g, a):
    """Analytic Draine sampling (Jendersie & d'Eon 2023; Sampler.slang:217-266)."""
    g2 = g * g
    g3 = g * g2
    g4 = g2 * g2
    g6 = g2 * g4
    pgp1_2 = (1 + g2) * (1 + g2)
    t1a = -a + a * g4
    t1a3 = t1a * t1a * t1a
    t2 = -1296 * (-1 + g2) * (a - a * g2) * t1a * (4 * g2 + a * pgp1_2)
    t3 = 3 * g2 * (1 + g * (-1 + 2 * u1)) + a * (2 + g2 + g3 * (1 + 2 * g2) * (-1 + 2 * u1))
    t4a = 432 * t1a3 + t2 + 432 * (a - a * g2) * t3 * t3
    t4b = -144 * a * g2 + 288 * a * g4 - 144 * a * g6
    t4b3 = t4b * t4b * t4b
    t4 = t4a + jnp.sqrt(jnp.maximum(-4 * t4b3 + t4a * t4a, 0.0))
    t4p3 = jnp.cbrt(t4)
    cbrt2 = 2.0 ** (1.0 / 3.0)
    t6 = (2 * t1a + (48 * cbrt2 * (-(a * g2) + 2 * a * g4 - a * g6)) / jnp.where(jnp.abs(t4p3) < 1e-20, 1e-20, t4p3)
          + t4p3 / (3.0 * cbrt2)) / jnp.where(jnp.abs(a - a * g2) < 1e-20, 1e-20, (a - a * g2))
    t5 = 6 * (1 + g2) + t6
    sq5 = jnp.sqrt(jnp.maximum(t5, 0.0))
    inner = 6 * (1 + g2) - (8 * t3) / jnp.where(jnp.abs(a * (-1 + g2) * sq5) < 1e-20, 1e-20, a * (-1 + g2) * sq5) - t6
    term = -0.5 * sq5 + jnp.sqrt(jnp.maximum(inner, 0.0)) / 2.0
    return (1 + g2 - term * term) / (2.0 * g)


def sample_draine(state, incident, g, a):
    state, u = rng.next_float2(state)
    g = jnp.asarray(g, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    iso = 2.0 * u[..., 0] - 1.0
    g_safe = jnp.where(jnp.abs(g) < 1e-5, 1e-5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u[..., 0])
    hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    a_safe = jnp.where(jnp.abs(a) < 1e-5, 1e-5, a)
    dr = _draine_cos_theta(u[..., 0], g_safe, a_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-5, iso, jnp.where(jnp.abs(a) < 1e-5, hg, dr))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    phi = 2.0 * jnp.pi * u[..., 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return state, _local_to_world_around(incident, local)


def hg_plus_draine_params(d):
    """Fitted HG+Draine mixture constants for droplet size d (Sampler.slang:269-274)."""
    d = jnp.asarray(d, jnp.float32)
    g_hg = jnp.exp(-(0.0990567 / (d - 1.67154)))
    g_d = jnp.exp(-(2.20679 / (d + 3.91029)) - 0.428934)
    alpha_d = jnp.exp(3.62489 - (8.29288 / (d + 5.52825)))
    w_d = jnp.exp(-(0.599085 / (d - 0.641583)) - 0.665888)
    return g_hg, g_d, alpha_d, w_d


def sample_hg_plus_draine(state, incident, d, ray_depth):
    """HG+Draine mixture with per-depth exponent (Sampler.slang:269-284)."""
    g_hg, g_d, alpha_d, w_d = hg_plus_draine_params(d)
    depth_f = jnp.asarray(ray_depth, jnp.float32)
    g_hg = jnp.power(jnp.maximum(g_hg, 0.0), 1.0 + depth_f)
    g_d = jnp.power(jnp.maximum(g_d, 0.0), 1.0 + depth_f)
    state, u = rng.next_float(state)
    state_hg, dir_hg = sample_henyey_greenstein(state, incident, g_hg)
    state_dr, dir_dr = sample_draine(state, incident, g_d, alpha_d)
    pick_hg = u < w_d
    new_state = jnp.where(pick_hg, state_hg, state_dr)
    new_dir = jnp.where(pick_hg[..., None], dir_hg, dir_dr)
    return new_state, new_dir


def sample_scatter_distance(state, density):
    """Exponential free-flight distance -ln(u)/σ (Sampler.slang:424-428)."""
    state, u = rng.next_float(state)
    return state, -jnp.log(jnp.maximum(u, 1e-37)) / density


# ---------------------------------------------------------------------------
# Phase function evaluation (RTCommon.slang:197-227)


def phase_rayleigh(v, l):
    cos_t = dot(v, l)
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)


def phase_mie_approx(v, l, g=0.85):
    cos_t = dot(v, l)
    g = jnp.minimum(jnp.asarray(g, jnp.float32), 0.9381)
    k = 1.55 * g - 0.55 * g * g * g
    kc = k * cos_t
    return (1.0 - k * k) / ((4.0 * jnp.pi) * (1.0 - kc) * (1.0 - kc))


def phase_henyey_greenstein(v, l, g):
    g = jnp.asarray(g, jnp.float32)
    cos_t = dot(v, l)
    denom = jnp.power(jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-9), 1.5)
    hg = (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / denom
    return jnp.where(g == 0.0, 1.0 / (4.0 * jnp.pi), hg)


def phase_draine(v, l, g, a):
    cos_t = dot(v, l)
    denom = 4.0 * (1.0 + (a * (1.0 + 2.0 * g * g)) / 3.0) * jnp.pi
    denom = denom * jnp.power(jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-9), 1.5)
    return ((1.0 - g * g) * (1.0 + a * cos_t * cos_t)) / denom


def phase_hg_plus_draine(v, l, d, ray_depth):
    g_hg, g_d, alpha_d, w_d = hg_plus_draine_params(d)
    depth_f = jnp.asarray(ray_depth, jnp.float32)
    g_hg = jnp.power(jnp.maximum(g_hg, 0.0), 1.0 + depth_f)
    g_d = jnp.power(jnp.maximum(g_d, 0.0), 1.0 + depth_f)
    return w_d * phase_henyey_greenstein(v, l, g_hg) + (1.0 - w_d) * phase_draine(v, l, g_d, alpha_d)
