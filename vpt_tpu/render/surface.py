"""Hit-surface reconstruction: interpolation, normal fixups, tangent frames,
texture fetches.

Wavefront port of Surface.slang (geometry) and the texture-application part
of Material.slang:39-87.  All functions are batched over the ray wavefront;
"hit" inputs come from vpt_tpu.accel.traverse.Hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vpt_tpu.core.vecmath import cross, dot, normalize, reflect


class SurfaceGeom(NamedTuple):
    world_pos: jnp.ndarray  # (N, 3)
    uv: jnp.ndarray  # (N, 2)
    normal: jnp.ndarray  # (N, 3) shading normal after fixups
    tangent: jnp.ndarray  # (N, 3)
    bitangent: jnp.ndarray  # (N, 3)
    geom_normal: jnp.ndarray  # (N, 3)
    hit_from_inside: jnp.ndarray  # (N,) bool
    mat_id: jnp.ndarray  # (N,) i32
    mat_row: jnp.ndarray  # (N, MAT_ATTR_COLS) packed material attributes
    local_tri: jnp.ndarray  # (N,) i32 PrimitiveIndex equivalent
    instance: jnp.ndarray  # (N,) i32
    tri_slot: jnp.ndarray  # (N,) i32 reordered global slot
    area: jnp.ndarray  # (N,) world-space triangle area
    em_tcount: jnp.ndarray  # (N,) f32 emissive tri count of the instance (0 = not emissive)


def sample_texture(textures, tex_dims, tex_id, uv):
    """Bilinear, repeat-wrap texture fetch from the flat RGBA8 texel pool.

    textures: (P,) uint32 packed texels; tex_dims: (K, 3) (h, w, offset);
    tex_id: (N,); uv: (N, 2).  Returns (N, 4) f32 in [0, 1].  Four scalar
    gathers + in-register RGBA8 decode per sample — a quarter of the
    bandwidth of f32x4 rows.
    """
    dims = tex_dims[tex_id]  # (N, 3)
    h = dims[:, 0].astype(jnp.float32)
    w = dims[:, 1].astype(jnp.float32)
    off = dims[:, 2]
    wi = jnp.maximum(dims[:, 1], 1)
    # Repeat wrap; texel centers at half-integers (matches linear samplers).
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i = wrap(x0, w)
    x1i = wrap(x0 + 1, w)
    y0i = wrap(y0, h)
    y1i = wrap(y0 + 1, h)

    def fetch(yi, xi):
        texel = textures[off + yi * wi + xi]  # (N,) uint32
        return jnp.stack(
            [
                (texel & 0xFF).astype(jnp.float32),
                ((texel >> 8) & 0xFF).astype(jnp.float32),
                ((texel >> 16) & 0xFF).astype(jnp.float32),
                (texel >> 24).astype(jnp.float32),
            ],
            axis=-1,
        ) * (1.0 / 255.0)

    t00 = fetch(y0i, x0i)
    t10 = fetch(y0i, x1i)
    t01 = fetch(y1i, x0i)
    t11 = fetch(y1i, x1i)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def make_surface(
    scene, hit, ray_dir, use_only_geometry_normals: bool, has_textures: bool = True
) -> SurfaceGeom:
    """Surface.slang:26-117 for a whole wavefront.

    `hit.tri` must be clamped to a valid slot for missed lanes by the caller
    (results are masked out downstream).  All per-triangle attributes come
    from ONE (N, 32) row gather of scene.tri_attr, and the material
    attributes from one (N, 32) row gather of materials.attr — per-lane
    gathers dominate TPU shading time, so this is the hot path's layout.
    """
    slot = hit.tri
    row = scene.tri_attr[slot]  # (N, 32)
    p0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    u = hit.u[:, None]
    v = hit.v[:, None]

    world_pos = p0 + u * e1 + v * e2
    uv = row[:, 18:20] * (1.0 - u - v) + row[:, 20:22] * u + row[:, 22:24] * v
    mat_id = row[:, 24].astype(jnp.int32)
    mat_row = scene.materials.attr[mat_id]  # (N, 32)

    geom_n = normalize(cross(e1, e2))
    area = 0.5 * jnp.sqrt(jnp.maximum(dot(cross(e1, e2), cross(e1, e2)), 0.0))

    if use_only_geometry_normals:
        n = geom_n
    else:
        n = normalize(
            row[:, 9:12] * (1.0 - u - v) + row[:, 12:15] * u + row[:, 15:18] * v
        )

    view = -ray_dir
    inside = dot(geom_n, view) < 0.0
    n = jnp.where(inside[:, None], -n, n)
    geom_n = jnp.where(inside[:, None], -geom_n, geom_n)

    up = jnp.where(
        (jnp.abs(n[:, 2:3]) < 0.9999999),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    tangent = normalize(cross(up, n))
    bitangent = normalize(cross(n, tangent))

    if not use_only_geometry_normals and has_textures:
        # Normal mapping (Surface.slang:85-90); slot 1 default is flat.
        ntex = mat_row[:, 24].astype(jnp.int32)
        nval = sample_texture(scene.textures, scene.texture_dims, ntex, uv)[:, :3] * 2.0 - 1.0
        n = normalize(nval[:, 0:1] * tangent + nval[:, 1:2] * bitangent + nval[:, 2:3] * n)

    # Fixup 1: pull the normal toward the view direction (Surface.slang:92-100).
    ndotv = dot(n, view)
    eps1 = 0.01
    pulled = normalize(n - view * (ndotv - eps1)[:, None])
    n = jnp.where((ndotv < 0.0)[:, None], pulled, n)

    # Fixup 2: keep the perfect reflection above the geometric surface
    # (Surface.slang:102-112).
    perfect = normalize(reflect(-view, n))
    eps2 = 0.1
    dot_ng = dot(n, geom_n)
    pushed = normalize(n + geom_n * (eps2 + dot_ng)[:, None])
    n = jnp.where((dot(perfect, geom_n) < 0.0)[:, None], pushed, n)

    # Recompute the frame — note the reversed cross order the reference uses
    # after fixups (Surface.slang:115-116): tangent = cross(normal, up).
    tangent = normalize(cross(n, up))
    bitangent = normalize(cross(n, tangent))

    return SurfaceGeom(
        world_pos=world_pos,
        uv=uv,
        normal=n,
        tangent=tangent,
        bitangent=bitangent,
        geom_normal=geom_n,
        hit_from_inside=inside,
        mat_id=mat_id,
        mat_row=mat_row,
        local_tri=row[:, 25].astype(jnp.int32),
        instance=row[:, 26].astype(jnp.int32),
        tri_slot=slot,
        area=area,
        em_tcount=row[:, 27],
    )


def rotate_tangents(surf: SurfaceGeom, rotation_degrees) -> SurfaceGeom:
    """Anisotropy rotation (Surface.slang:139-147)."""
    rot = rotation_degrees * (jnp.pi / 180.0)
    c = jnp.cos(rot)[:, None]
    s = jnp.sin(rot)[:, None]
    n = surf.normal
    t = surf.tangent
    t_new = t * c + cross(n, t) * s + n * dot(n, t, keepdims=True) * (1.0 - c)
    b_new = cross(t_new, n)
    return surf._replace(tangent=t_new, bitangent=b_new)


def world_to_tangent(surf: SurfaceGeom, vec):
    return normalize(
        jnp.stack(
            [dot(vec, surf.tangent), dot(vec, surf.bitangent), dot(vec, surf.normal)], axis=-1
        )
    )


def tangent_to_world(surf: SurfaceGeom, vec):
    return normalize(
        vec[..., 0:1] * surf.tangent + vec[..., 1:2] * surf.bitangent + vec[..., 2:3] * surf.normal
    )
