"""Energy-conserving multi-lobe BSDF.

Wavefront port of Material.slang: five lobes (Metallic / Diffuse /
SpecularDielectric / GlassReflect / GlassRefract) selected with the
reference's normalized probabilities (Material.slang:96-105), evaluated as a
one-sample MIS estimator that sums all lobes (EvaluateBSDF,
Material.slang:167-279).  Anisotropic GGX with VNDF sampling and Turquin-2019
energy compensation from the baked lookup tables.

All math is in tangent space (+Z = shading normal), batched over rays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import dot, normalize, reflect, refract
from vpt_tpu.render import sampling
from vpt_tpu.render.surface import sample_texture

# Lobe ids (BSDFComponent, Material.slang:20-27)
METALLIC, DIFFUSE, SPECULAR_DIELECTRIC, GLASS_REFLECT, GLASS_REFRACT = range(5)


class MaterialProps(NamedTuple):
    """Per-ray material after texture application (Material.slang:39-87)."""

    base_color: jnp.ndarray  # (N, 3)
    emissive_color: jnp.ndarray  # (N, 3)
    specular_color: jnp.ndarray  # (N, 3)
    medium_color: jnp.ndarray  # (N, 3)
    medium_emissive_color: jnp.ndarray  # (N, 3)
    metallic: jnp.ndarray  # (N,)
    roughness: jnp.ndarray
    ior: jnp.ndarray
    transmission: jnp.ndarray
    anisotropy: jnp.ndarray
    anisotropy_rotation: jnp.ndarray
    medium_density: jnp.ndarray
    medium_anisotropy: jnp.ndarray
    eta: jnp.ndarray  # relative IOR by hit side
    ax: jnp.ndarray
    ay: jnp.ndarray


def make_material(
    scene, mat_row, uv, hit_from_inside, furnace_test_mode: bool,
    has_textures: bool = True,
) -> MaterialProps:
    """`mat_row` is the (N, MAT_ATTR_COLS) packed material gather performed
    by make_surface (see vpt_tpu.scene.types MAT_ATTR layout) — no further
    per-lane table lookups happen here."""
    base = mat_row[:, 0:3]
    emissive = mat_row[:, 3:6]
    specular = mat_row[:, 6:9]
    medium_color = mat_row[:, 9:12]
    medium_emissive = mat_row[:, 12:15]
    metal = mat_row[:, 15]
    rough = mat_row[:, 16]
    if has_textures:
        tex_base = sample_texture(
            scene.textures, scene.texture_dims, mat_row[:, 23].astype(jnp.int32), uv
        )
        base = base * jnp.power(jnp.maximum(tex_base[:, :3], 0.0), 2.2)
        rough = rough * sample_texture(
            scene.textures, scene.texture_dims, mat_row[:, 25].astype(jnp.int32), uv
        )[:, 0]
        metal = metal * sample_texture(
            scene.textures, scene.texture_dims, mat_row[:, 26].astype(jnp.int32), uv
        )[:, 0]
        emissive = emissive * sample_texture(
            scene.textures, scene.texture_dims, mat_row[:, 27].astype(jnp.int32), uv
        )[:, :3]

    ior = jnp.maximum(mat_row[:, 17], 1.000001)
    aniso = mat_row[:, 19]
    aspect = jnp.sqrt(1.0 - jnp.sqrt(jnp.maximum(aniso, 0.0)) * 0.9)
    ax = jnp.maximum(1e-5, rough / aspect)
    ay = jnp.maximum(1e-5, rough * aspect)
    eta = jnp.where(hit_from_inside, ior, 1.0 / ior)
    if furnace_test_mode:
        base = jnp.ones_like(base)
        emissive = jnp.zeros_like(emissive)
        specular = jnp.ones_like(specular)
        medium_color = jnp.ones_like(medium_color)
        medium_emissive = jnp.zeros_like(medium_emissive)

    return MaterialProps(
        base_color=base,
        emissive_color=emissive,
        specular_color=specular,
        medium_color=medium_color,
        medium_emissive_color=medium_emissive,
        metallic=metal,
        roughness=rough,
        ior=ior,
        transmission=mat_row[:, 18],
        anisotropy=aniso,
        anisotropy_rotation=mat_row[:, 20],
        medium_density=mat_row[:, 21],
        medium_anisotropy=mat_row[:, 22],
        eta=eta,
        ax=ax,
        ay=ay,
    )


def lobe_probabilities(props: MaterialProps):
    """Normalized lobe-selection probabilities (Material.slang:96-105)."""
    p_metal = props.metallic
    p_diel = (1.0 - props.metallic) * (1.0 - props.transmission)
    p_glass = (1.0 - props.metallic) * props.transmission
    total = jnp.maximum(p_metal + p_diel + p_glass, 1e-20)
    return p_metal / total, p_diel / total, p_glass / total


def schlick_fresnel(vdoth):
    m = jnp.clip(1.0 - vdoth, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def dielectric_fresnel(vdoth, eta):
    """Exact dielectric Fresnel with TIR (Material.slang:434-449)."""
    cos_i = vdoth
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    rs = (eta * cos_t - cos_i) / jnp.where(jnp.abs(eta * cos_t + cos_i) < 1e-20, 1e-20, eta * cos_t + cos_i)
    rp = (eta * cos_i - cos_t) / jnp.where(jnp.abs(eta * cos_i + cos_t) < 1e-20, 1e-20, eta * cos_i + cos_t)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin_t_sq > 1.0, 1.0, f)


def ggx_d_anisotropic(h, ax, ay):
    hx2 = h[..., 0] ** 2
    hy2 = h[..., 1] ** 2
    hz2 = h[..., 2] ** 2
    ax2 = ax * ax
    ay2 = ay * ay
    denom = jnp.pi * ax * ay * (hx2 / ax2 + hy2 / ay2 + hz2) ** 2
    return 1.0 / jnp.maximum(denom, 1e-20)


def ggx_smith_lambda(v, ax, ay):
    vx2 = v[..., 0] ** 2
    vy2 = v[..., 1] ** 2
    vz2 = v[..., 2] ** 2
    nom = -1.0 + jnp.sqrt(1.0 + (ax * ax * vx2 + ay * ay * vy2) / jnp.maximum(vz2, 1e-20))
    return nom / 2.0


def ggx_smith_g1(v, ax, ay):
    return 1.0 / (1.0 + ggx_smith_lambda(v, ax, ay))


def energy_comp_terms(props: MaterialProps, scene, vz, use_energy_compensation: bool):
    """The Turquin energy terms E_reflect(v.z, rough, aniso) and
    E_glass(v.z, rough, ior) (Material.slang:146-165 table fetches).

    Evaluated from the Chebyshev fits (vpt_tpu.render.lookup_fit) — pure
    register math, no gathers.  Depends only on the view ray and material,
    so the integrator computes it ONCE per bounce and shares it across the
    three BSDF evaluations (sample + sky NEE + light NEE).
    """
    from vpt_tpu.render.lookup_fit import eval_fit, layer_coord

    if not use_energy_compensation:
        one = jnp.ones_like(vz)
        return one, one
    layer_g = layer_coord((jnp.clip(props.ior, 1.0001, 2.0) - 1.0) * 32.0, 32)
    u_g = jnp.sqrt(jnp.maximum(vz, 0.0))
    comp_in = eval_fit(scene.lookup_refract_in, u_g, props.roughness, layer_g)
    comp_out = eval_fit(scene.lookup_refract_out, u_g, props.roughness, layer_g)
    glass_comp = jnp.where(props.eta > 1.0, comp_in, comp_out)
    glass_comp = jnp.clip(glass_comp, 0.0, 1.0)

    layer_r = layer_coord(props.anisotropy * 32.0, 32)
    refl_e = eval_fit(scene.lookup_reflect, vz, props.roughness, layer_r)
    refl_e = jnp.clip(refl_e, 1e-4, 1.0)
    return refl_e, glass_comp


def evaluate_reflection(v, l, f_color, ax, ay):
    """Microfacet reflection (Material.slang:331-351). Returns (brdf, pdf)."""
    h = normalize(v + l)
    vdoth = dot(v, h)
    d = ggx_d_anisotropic(h, ax, ay)
    gv = ggx_smith_g1(v, ax, ay)
    gl = ggx_smith_g1(l, ax, ay)
    vz = jnp.maximum(v[..., 2], 1e-8)
    pdf = (gv * jnp.maximum(vdoth, 0.0) * d / vz) / jnp.maximum(4.0 * vdoth, 1e-20)
    brdf = (d * gv * gl / (4.0 * vz))[..., None] * f_color
    bad = l[..., 2] <= 1e-5
    return jnp.where(bad[..., None], 0.0, brdf), jnp.where(bad, 0.0, pdf)


def evaluate_refraction(v, l, f_color, eta, ax, ay):
    """Microfacet refraction with the η² Jacobian (Material.slang:359-387)."""
    h = normalize(eta[..., None] * v + l)
    h = jnp.where((h[..., 2] < 0.0)[..., None], -h, h)
    vdoth = dot(v, h)
    ldoth = dot(l, h)
    d = ggx_d_anisotropic(h, ax, ay)
    gv = ggx_smith_g1(v, ax, ay)
    gl = ggx_smith_g1(l, ax, ay)
    denom = ldoth + eta * vdoth
    denom2 = jnp.maximum(denom * denom, 1e-20)
    eta2 = eta * eta
    jac = (eta2 * jnp.abs(ldoth)) / denom2
    vz = jnp.maximum(jnp.abs(v[..., 2]), 1e-8)
    pdf = (gv * jnp.abs(vdoth) * d / vz) * jac
    bsdf_s = (d * gv * gl * eta2 / denom2) * (jnp.abs(vdoth) * jnp.abs(ldoth) / vz)
    bsdf = bsdf_s[..., None] * f_color
    bad = l[..., 2] >= 1e-5
    return jnp.where(bad[..., None], 0.0, bsdf), jnp.where(bad, 0.0, pdf)


def evaluate_bsdf(props: MaterialProps, scene, v, l, use_energy_compensation: bool,
                  comp=None):
    """Full one-sample-MIS evaluation (Material.slang:167-279).

    `comp` is an optional precomputed (refl_e, glass_comp) pair from
    energy_comp_terms — it depends only on (v, material), so callers that
    evaluate several light directions per bounce share one computation.
    Returns (bxdf (N, 3), pdf (N,)).
    """
    p_metal, p_diel, p_glass = lobe_probabilities(props)
    refracted = l[..., 2] < 0.0

    # Half vector for the Fresnel split
    h_refl = normalize(v + l)
    h_refr = normalize(props.eta[..., None] * v + l)
    h_refr = jnp.where((h_refr[..., 2] < 0.0)[..., None], -h_refr, h_refr)
    h = jnp.where(refracted[..., None], h_refr, h_refl)
    vdoth = dot(v, h)
    ldoth = dot(l, h)
    valid_refraction = ((vdoth > 0.0) & (ldoth < 0.0)) | ((vdoth < 0.0) & (ldoth > 0.0))
    f_diel = dielectric_fresnel(jnp.abs(vdoth), props.eta)

    if comp is None:
        comp = energy_comp_terms(props, scene, v[..., 2], use_energy_compensation)
    refl_e, glass_comp = comp

    bxdf = jnp.zeros_like(v)
    pdf = jnp.zeros_like(f_diel)
    not_refr = ~refracted

    # Metallic (Material.slang:291-308)
    f_metal = (
        props.base_color
        + (props.specular_color - props.base_color) * schlick_fresnel(dot(v, h_refl))[..., None]
    )
    m_brdf, m_pdf = evaluate_reflection(v, l, f_metal, props.ax, props.ay)
    if use_energy_compensation:
        comp = (1.0 - refl_e) / refl_e
        m_brdf = (1.0 + props.base_color * comp[..., None]) * m_brdf
    bxdf += jnp.where(not_refr[..., None], m_brdf * p_metal[..., None], 0.0)
    pdf += jnp.where(not_refr, m_pdf * p_metal, 0.0)

    # Diffuse (Material.slang:281-289)
    lz = l[..., 2]
    d_pdf = jnp.where(lz > 0.0, lz / jnp.pi, 0.0)
    d_brdf = props.base_color * (lz / jnp.pi)[..., None]
    w_d = (p_diel * (1.0 - f_diel))
    bxdf += jnp.where(not_refr[..., None], d_brdf * w_d[..., None], 0.0)
    pdf += jnp.where(not_refr, d_pdf * w_d, 0.0)

    # Specular dielectric (Material.slang:310-323)
    s_brdf, s_pdf = evaluate_reflection(v, l, props.specular_color, props.ax, props.ay)
    if use_energy_compensation:
        s_brdf = s_brdf / refl_e[..., None]
    w_s = p_diel * f_diel
    bxdf += jnp.where(not_refr[..., None], s_brdf * w_s[..., None], 0.0)
    pdf += jnp.where(not_refr, s_pdf * w_s, 0.0)

    # Glass reflect (Material.slang:247-260)
    g_brdf, g_pdf = evaluate_reflection(v, l, props.specular_color, props.ax, props.ay)
    g_brdf = jnp.where((glass_comp > 0.01)[..., None], g_brdf / jnp.maximum(glass_comp, 1e-4)[..., None], g_brdf)
    w_gr = p_glass * f_diel
    bxdf += jnp.where(not_refr[..., None], g_brdf * w_gr[..., None], 0.0)
    pdf += jnp.where(not_refr, g_pdf * w_gr, 0.0)

    # Glass refract (Material.slang:262-276)
    r_bsdf, r_pdf = evaluate_refraction(v, l, props.base_color, props.eta, props.ax, props.ay)
    r_bsdf = jnp.where((glass_comp > 0.01)[..., None], r_bsdf / jnp.maximum(glass_comp, 1e-4)[..., None], r_bsdf)
    w_gt = p_glass * (1.0 - f_diel)
    ok_refr = refracted & valid_refraction
    bxdf += jnp.where(ok_refr[..., None], r_bsdf * w_gt[..., None], 0.0)
    pdf += jnp.where(ok_refr, r_pdf * w_gt, 0.0)

    return bxdf, pdf


def sample_bsdf(state, props: MaterialProps, scene, v, h, use_energy_compensation: bool,
                comp=None):
    """Lobe selection + direction sampling + full evaluation
    (SampleBSDF, Material.slang:94-165).

    `h` is the pre-sampled VNDF half-vector.  Returns
    (state, l, bxdf, pdf, component).
    """
    p_metal, p_diel, _ = lobe_probabilities(props)
    f_diel = dielectric_fresnel(dot(v, h), props.eta)

    state, x1 = rng.next_float(state)
    state, x2 = rng.next_float(state)  # reflect-vs-(diffuse|refract) split
    # Cosine-hemisphere draw is consumed unconditionally (masked lanes keep
    # the chain aligned; statistically equivalent to the reference's lazy draw).
    state, l_diffuse = sampling.sample_cosine_hemisphere(
        state, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], v.dtype), v.shape)
    )

    l_reflect = normalize(reflect(-v, h))
    l_refract = normalize(refract(-v, h, props.eta))

    pick_metal = x1 < p_metal
    pick_diel = (~pick_metal) & (x1 < p_metal + p_diel)
    pick_glass = (~pick_metal) & (~pick_diel)
    reflect_branch = x2 < f_diel

    component = jnp.where(
        pick_metal,
        METALLIC,
        jnp.where(
            pick_diel,
            jnp.where(reflect_branch, SPECULAR_DIELECTRIC, DIFFUSE),
            jnp.where(reflect_branch, GLASS_REFLECT, GLASS_REFRACT),
        ),
    ).astype(jnp.int32)

    use_reflect = pick_metal | (pick_diel & reflect_branch) | (pick_glass & reflect_branch)
    use_diffuse = pick_diel & ~reflect_branch
    l = jnp.where(
        use_reflect[..., None],
        l_reflect,
        jnp.where(use_diffuse[..., None], l_diffuse, l_refract),
    )
    refracted = pick_glass & ~reflect_branch

    invalid = (~refracted & (l[..., 2] < 0.0)) | (refracted & (l[..., 2] >= 0.0))

    bxdf, pdf = evaluate_bsdf(props, scene, v, l, use_energy_compensation, comp=comp)
    bxdf = jnp.where(invalid[..., None], 0.0, bxdf)
    pdf = jnp.where(invalid, 0.0, pdf)
    return state, l, bxdf, pdf, component
