"""Light sampling: environment map (alias map), emissive triangles, sun disk.

Wavefront ports of Sampler.slang:286-476 and the miss-shader radiance lookup
(Miss.slang:8-77), preserving the reference's conventions: equirect mapping
with the PDF stored in the env image's alpha channel, alias-map O(1) texel
selection with in-texel solid-angle jitter, sky azimuth/altitude rotation,
and the d²/(N_mesh·N_tri·area·cosθ) emissive-triangle PDF.
"""

from __future__ import annotations

import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import cross, dot, normalize, rotate_axis_angle
from vpt_tpu.render.surface import SurfaceGeom  # noqa: F401  (type reference)

X_AXIS = (1.0, 0.0, 0.0)
Y_AXIS = (0.0, 1.0, 0.0)
SUN_THETA = 0.004675  # radians (Sampler.slang:469)
SUN_RADIANCE_SCALE = 2e5  # Sampler.slang:459


def _env_bilinear(env, u, v):
    """Bilinear env fetch, wrap-u / clamp-v, returning RGBA (pdf in alpha).

    `env` is EnvMapData (or anything with .image/.quad).  When the
    precomputed 2x2 quad layout is available the fetch is ONE row gather;
    otherwise four corner gathers (large envs skip the 4x quad memory)."""
    env_image = env.image
    h, w = env_image.shape[0], env_image.shape[1]
    x = u * w - 0.5
    y = jnp.clip(v, 0.0, 1.0) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    if env.quad.shape[0] == h:
        q = env.quad.reshape(h * w, 16)[y0i * w + x0i]
        t00, t10, t01, t11 = q[..., 0:4], q[..., 4:8], q[..., 8:12], q[..., 12:16]
    else:
        x1i = jnp.mod(x0i + 1, w)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        t00 = env_image[y0i, x0i]
        t10 = env_image[y0i, x1i]
        t01 = env_image[y1i, x0i]
        t11 = env_image[y1i, x1i]
    return (t00 * (1 - fx) + t10 * fx) * (1 - fy) + (t01 * (1 - fx) + t11 * fx) * fy


def env_radiance(env, direction, azimuth_deg, altitude_deg):
    """Miss-shader env lookup with inverse sky rotation (Miss.slang:18-57).

    Returns RGBA; alpha is the stored sampling PDF for MIS.
    """
    az = azimuth_deg / 180.0 * jnp.pi
    al = altitude_deg / 180.0 * jnp.pi
    d = rotate_axis_angle(direction, X_AXIS, -al)
    d = rotate_axis_angle(d, Y_AXIS, -az)
    gamma = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
    theta = jnp.arctan2(d[..., 0], -d[..., 2])
    u = theta * (0.5 / jnp.pi) + 0.5
    v = gamma * (1.0 / jnp.pi) + 0.5
    return _env_bilinear(env, u, v)


def importance_sample_env(state, env, azimuth_deg, altitude_deg, shape):
    """Alias-map env sampling (ImportanceSampleEnvMap, Sampler.slang:286-346).

    Returns (state, to_light (N,3), rgba (N,4)) — rgba.a is the PDF.
    `shape` is the wavefront shape (N,).
    """
    img = env.image
    h, w = img.shape[0], img.shape[1]
    size = h * w

    state, xi = rng.next_float3(state)
    idx = jnp.minimum((xi[..., 0] * size).astype(jnp.int32), size - 1)
    arow = env.alias[idx]  # packed [importance, index] — one gather
    imp = arow[..., 0]
    ali = arow[..., 1].astype(jnp.int32)

    take_self = xi[..., 1] < imp
    env_idx = jnp.where(take_self, idx, ali)
    xi_y = jnp.where(
        take_self,
        xi[..., 1] / jnp.maximum(imp, 1e-12),
        (xi[..., 1] - imp) / jnp.maximum(1.0 - imp, 1e-12),
    )

    px = (env_idx % w).astype(jnp.float32)
    py = (env_idx // w).astype(jnp.float32)

    u = (px + xi_y) / w
    phi = u * (2.0 * jnp.pi) - jnp.pi
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)

    step_theta = jnp.pi / h
    theta0 = py * step_theta
    cos_theta = jnp.cos(theta0) * (1.0 - xi[..., 2]) + jnp.cos(theta0 + step_theta) * xi[..., 2]
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    v = theta * (1.0 / jnp.pi)

    to_light = jnp.stack([sin_phi * sin_theta, -cos_theta, -cos_phi * sin_theta], axis=-1)
    az = azimuth_deg / 180.0 * jnp.pi
    al = altitude_deg / 180.0 * jnp.pi
    to_light = rotate_axis_angle(to_light, Y_AXIS, az)
    to_light = rotate_axis_angle(to_light, X_AXIS, al)

    rgba = _env_bilinear(env, u, v)
    return state, to_light, rgba


def sample_sun_disk(state, sun_color, environment_intensity, azimuth_deg, altitude_deg, shape):
    """Sun-disk cone sampling for atmosphere mode (Sampler.slang:430-462)."""
    az = azimuth_deg / 180.0 * jnp.pi
    al = altitude_deg / 180.0 * jnp.pi
    base = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0], jnp.float32), shape + (3,))
    sun_dir = rotate_axis_angle(base, X_AXIS, al)
    sun_dir = rotate_axis_angle(sun_dir, Y_AXIS, az)

    cos_max = jnp.cos(jnp.float32(SUN_THETA))
    state, u1 = rng.next_float(state)
    state, u2 = rng.next_float(state)
    phi = 2.0 * jnp.pi * u1
    cos_t = cos_max + (1.0 - cos_max) * u2
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)

    wz = normalize(sun_dir)
    up = jnp.where(
        (jnp.abs(wz[..., 2:3]) < 0.999),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), wz.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), wz.shape),
    )
    u_ax = normalize(cross(up, wz))
    v_ax = cross(wz, u_ax)
    to_light = u_ax * local[..., 0:1] + v_ax * local[..., 1:2] + wz * local[..., 2:3]

    solid_angle = 2.0 * jnp.pi * (1.0 - cos_max)
    pdf = jnp.full(shape, 1.0 / solid_angle, jnp.float32)
    color = jnp.broadcast_to(sun_color * SUN_RADIANCE_SCALE * environment_intensity, shape + (3,))
    return state, to_light, color, pdf


def sample_emissive_triangle(state, scene, position, n_emissive: int, has_textures: bool = True):
    """Uniform mesh -> uniform triangle -> uniform barycentric NEE sample
    (SampleEmissiveTriangle, Sampler.slang:348-422).

    Returns (state, to_light, color (N,3), pdf (N,), slot, instance,
    distance).  `slot` is the sampled triangle's VIRTUAL id — the same id
    space `Hit.tri` reports — so shadow-ray visibility can compare ids
    exactly (ClosestHit.slang:169-176 compares triangle+instance; the
    virtual id encodes both).
    """
    shape = position.shape[:-1]
    if n_emissive == 0:
        z = jnp.zeros(shape, jnp.float32)
        return (
            state,
            jnp.zeros(shape + (3,), jnp.float32),
            jnp.zeros(shape + (3,), jnp.float32),
            z,
            jnp.full(shape, -1, jnp.int32),
            jnp.full(shape, -1, jnp.int32),
            z,
        )

    em = scene.emissive
    state, u_mesh = rng.next_float(state)
    mesh_idx = jnp.minimum((u_mesh * n_emissive).astype(jnp.int32), n_emissive - 1)
    em_row = em.attr[mesh_idx]  # (N, 4): [tri_count, offset, instance, material]
    tri_count_f = em_row[..., 0]
    state, u_tri = rng.next_float(state)
    tri_idx = jnp.minimum(
        (u_tri * tri_count_f).astype(jnp.int32), tri_count_f.astype(jnp.int32) - 1
    )

    entry = em_row[..., 1].astype(jnp.int32) + tri_idx
    slot = em.slot_table[entry]
    # Gather from the emissive-only row table (few hundred rows) rather
    # than the full (n_tris, 32) tri_attr: full-table row gathers are
    # HBM-latency-bound on TPU (~0.5 us/row).
    row = em.tri_rows[entry]  # one packed gather: p0/e1/e2 + uvs
    p0 = row[..., 0:3]
    e1 = row[..., 3:6]
    e2 = row[..., 6:9]

    state, xi = rng.next_float2(state)
    su1 = jnp.sqrt(xi[..., 0])
    b0 = 1.0 - su1
    b1 = xi[..., 1] * su1
    b2 = 1.0 - b0 - b1
    # p = b0*v0 + b1*v1 + b2*v2 with v1 = p0+e1, v2 = p0+e2
    tri_pos = p0 + b1[..., None] * e1 + b2[..., None] * e2
    uv = (
        row[..., 18:20] * b0[..., None]
        + row[..., 20:22] * b1[..., None]
        + row[..., 22:24] * b2[..., None]
    )

    to_light = normalize(tri_pos - position)
    # Reference normal: cross(v2 - v0, v1 - v0) (Sampler.slang:405)
    normal = normalize(cross(e2, e1))
    area = 0.5 * jnp.sqrt(jnp.maximum(dot(cross(e1, e2), cross(e1, e2)), 0.0))

    dist_sq = dot(tri_pos - position, tri_pos - position)
    cos_theta = jnp.abs(dot(normal, to_light))
    denom = n_emissive * tri_count_f * area * cos_theta
    pdf = dist_sq / jnp.maximum(denom, 1e-20)
    pdf = jnp.where(denom > 0.0, pdf, 0.0)

    mat_id = em_row[..., 3].astype(jnp.int32)
    mat_row = scene.materials.attr[mat_id]
    color = mat_row[..., 3:6]
    if has_textures:
        from vpt_tpu.render.surface import sample_texture

        tex = sample_texture(
            scene.textures, scene.texture_dims, mat_row[..., 27].astype(jnp.int32), uv
        )
        color = color * tex[..., :3]
    return (
        state, to_light, color, pdf, slot.astype(jnp.int32),
        em_row[..., 2].astype(jnp.int32), jnp.sqrt(dist_sq),
    )
