"""Energy-compensation lookup-table baking (Turquin 2019).

JAX port of the first-launch Monte-Carlo bakes (Application.cpp:35-75,
LookupTableCalculator.cpp, LookupReflect.slang, LookupRefract.slang):

* reflection table (64×64×32): directional albedo E(V.z, roughness,
  anisotropy) of the GGX reflection lobe;
* refraction tables (128×128×32 ×2): directional albedo of the full
  dielectric reflect+refract over (√-encoded V.z, roughness, IOR∈[1,2]),
  one for hits from outside (ABOVE_SURFACE) and one from inside.

Unlike the reference's 10M-samples-per-texel GPU grind, each table is a
single jit that vmaps the estimator over all texels and `fori_loop`s sample
batches; a few thousand samples per texel is plenty for these smooth
integrals.  Results are cached on disk.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import normalize, reflect, refract
from vpt_tpu.render import sampling
from vpt_tpu.render.bsdf import dielectric_fresnel, ggx_d_anisotropic, ggx_smith_g1

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")

REFLECT_SHAPE = (32, 64, 64)  # (anisotropy layer, roughness row, V.z col)
REFRACT_SHAPE = (32, 128, 128)  # (ior layer, roughness row, sqrt(V.z) col)


def _reflection_estimate(state, view_cos, ax, ay):
    """One sample of the GGX reflection directional albedo."""
    state, u_phi = rng.next_float(state)
    xy = jnp.sqrt(jnp.maximum(1.0 - view_cos * view_cos, 0.0))
    phi = u_phi * 2.0 * jnp.pi
    v = normalize(jnp.stack([xy * jnp.cos(phi), xy * jnp.sin(phi), view_cos], axis=-1))
    state, h = sampling.sample_ggx_vndf(state, v, ax, ay)
    l = normalize(reflect(-v, h))

    # EvaluateReflection with F = 1 (Material.slang:331-351)
    d = ggx_d_anisotropic(h, ax, ay)
    gv = ggx_smith_g1(v, ax, ay)
    gl = ggx_smith_g1(l, ax, ay)
    vdoth = jnp.sum(v * h, axis=-1)
    vz = jnp.maximum(v[..., 2], 1e-8)
    pdf = (gv * jnp.maximum(vdoth, 0.0) * d / vz) / jnp.maximum(4.0 * vdoth, 1e-20)
    brdf = d * gv * gl / (4.0 * vz)
    val = brdf / jnp.maximum(pdf, 1e-20)
    ok = (l[..., 2] > 0.0) & (pdf > 0.0) & jnp.isfinite(val)
    return state, jnp.where(ok, val, 0.0)


def bake_reflection_table(n_samples: int = 4096, seed: int = 7) -> np.ndarray:
    nl, nr, nv = REFLECT_SHAPE
    layer = jnp.arange(nl, dtype=jnp.float32)[:, None, None]
    row = jnp.arange(nr, dtype=jnp.float32)[None, :, None]
    col = jnp.arange(nv, dtype=jnp.float32)[None, None, :]
    view_cos = jnp.clip(col / nv, 0.05, 0.999)
    roughness = jnp.clip(row / nr, 0.0001, 1.0)
    anisotropy = layer / nl
    aspect = jnp.sqrt(1.0 - jnp.sqrt(anisotropy) * 0.9)
    ax = jnp.maximum(1e-4, roughness / aspect)
    ay = jnp.maximum(1e-4, roughness * aspect)
    view_cos, ax, ay = jnp.broadcast_arrays(view_cos, ax, ay)

    shape = view_cos.shape
    state0 = rng.pcg_hash(
        (jnp.arange(np.prod(shape), dtype=jnp.uint32) + jnp.uint32(seed)).reshape(shape)
    )

    @jax.jit
    def run():
        def body(_, carry):
            state, acc = carry
            state, val = _reflection_estimate(
                state.reshape(-1), view_cos.reshape(-1), ax.reshape(-1), ay.reshape(-1)
            )
            return state.reshape(shape), acc + val.reshape(shape)

        _, acc = jax.lax.fori_loop(0, n_samples, body, (state0, jnp.zeros(shape, jnp.float32)))
        return acc / n_samples

    return np.asarray(run())


def _refraction_estimate(state, view_cos, roughness, eta):
    state, u_phi = rng.next_float(state)
    xy = jnp.sqrt(jnp.maximum(1.0 - view_cos * view_cos, 0.0))
    phi = u_phi * 2.0 * jnp.pi
    v = normalize(jnp.stack([xy * jnp.cos(phi), xy * jnp.sin(phi), view_cos], axis=-1))
    ax = roughness
    ay = roughness
    state, h = sampling.sample_ggx_vndf(state, v, ax, ay)
    vdoth = jnp.sum(v * h, axis=-1)
    f = dielectric_fresnel(jnp.abs(vdoth), eta)
    state, u_f = rng.next_float(state)

    # Reflection branch (F = 1 evaluation)
    l_r = normalize(reflect(-v, h))
    d = ggx_d_anisotropic(h, ax, ay)
    gv = ggx_smith_g1(v, ax, ay)
    vz = jnp.maximum(v[..., 2], 1e-8)
    gl_r = ggx_smith_g1(l_r, ax, ay)
    pdf_r = (gv * jnp.maximum(vdoth, 0.0) * d / vz) / jnp.maximum(4.0 * vdoth, 1e-20)
    brdf_r = d * gv * gl_r / (4.0 * vz)
    val_r = brdf_r / jnp.maximum(pdf_r, 1e-20)
    ok_r = (l_r[..., 2] > 0.0) & (pdf_r > 0.0) & jnp.isfinite(val_r)

    # Refraction branch (EvaluateRefraction with F = 1)
    l_t = normalize(refract(-v, h, eta))
    ldoth = jnp.sum(l_t * h, axis=-1)
    gl_t = ggx_smith_g1(l_t, ax, ay)
    denom = ldoth + eta * vdoth
    denom2 = jnp.maximum(denom * denom, 1e-20)
    eta2 = eta * eta
    jac = eta2 * jnp.abs(ldoth) / denom2
    pdf_t = (gv * jnp.abs(vdoth) * d / vz) * jac
    bsdf_t = (d * gv * gl_t * eta2 / denom2) * (jnp.abs(vdoth) * jnp.abs(ldoth) / vz)
    val_t = bsdf_t / jnp.maximum(pdf_t, 1e-20)
    ok_t = (l_t[..., 2] < 0.0) & (pdf_t > 0.0) & jnp.isfinite(val_t)

    pick_reflect = u_f < f
    val = jnp.where(pick_reflect, jnp.where(ok_r, val_r, 0.0), jnp.where(ok_t, val_t, 0.0))
    return state, val


def bake_refraction_table(above_surface: bool, n_samples: int = 4096, seed: int = 13) -> np.ndarray:
    nl, nr, nv = REFRACT_SHAPE
    layer = jnp.arange(nl, dtype=jnp.float32)[:, None, None]
    row = jnp.arange(nr, dtype=jnp.float32)[None, :, None]
    col = jnp.arange(nv, dtype=jnp.float32)[None, None, :]
    view_cos = jnp.clip((col / (nv - 1.0)) ** 2, 0.01, 0.9999)
    roughness = jnp.clip(row / (nr - 1.0), 0.01, 1.0)
    ior = 1.0 + jnp.clip(layer / (nl - 1.0), 0.0001, 1.0)
    eta = (1.0 / ior) if above_surface else ior
    view_cos, roughness, eta = jnp.broadcast_arrays(view_cos, roughness, eta)

    shape = view_cos.shape
    state0 = rng.pcg_hash(
        (jnp.arange(np.prod(shape), dtype=jnp.uint32) + jnp.uint32(seed)).reshape(shape)
    )

    @jax.jit
    def run():
        def body(_, carry):
            state, acc = carry
            state, val = _refraction_estimate(
                state.reshape(-1), view_cos.reshape(-1), roughness.reshape(-1), eta.reshape(-1)
            )
            return state.reshape(shape), acc + val.reshape(shape)

        _, acc = jax.lax.fori_loop(0, n_samples, body, (state0, jnp.zeros(shape, jnp.float32)))
        return acc / n_samples

    return np.asarray(run())


# Where the reference's committed .bin tables live; override with
# VPT_REFERENCE_TABLES (or the table_dir argument) on machines where the
# reference checkout is elsewhere (ADVICE r4).
REFERENCE_TABLE_DIR = os.environ.get(
    "VPT_REFERENCE_TABLES", "/root/reference/Assets/LookupTables"
)


def load_reference_tables(table_dir: str | None = None):
    """Load the reference's committed ground-truth tables (10M samples/texel,
    PathTracer.cpp:199-201).  File layout is raw f32 [layer][row][col]
    (PathTracer.cpp:871-937 uploads one x*y layer slice at a time), which is
    exactly REFLECT_SHAPE / REFRACT_SHAPE.  Returns (reflect, refract_out,
    refract_in) — "out" = HitFromOutside = ABOVE_SURFACE (eta = 1/ior).
    Raises FileNotFoundError if the binaries are absent."""
    table_dir = table_dir or REFERENCE_TABLE_DIR
    def _read(name, shape):
        a = np.fromfile(os.path.join(table_dir, name), dtype=np.float32)
        if a.size != np.prod(shape):
            raise ValueError(f"{name}: expected {np.prod(shape)} f32, got {a.size}")
        return a.reshape(shape)

    return (
        _read("ReflectionLookup.bin", REFLECT_SHAPE),
        _read("RefractionLookupHitFromOutside.bin", REFRACT_SHAPE),
        _read("RefractionLookupHitFromInside.bin", REFRACT_SHAPE),
    )


def get_lookup_tables(n_samples: int = 4096, cache_dir: str | None = None):
    """Bake (or load cached) tables; returns (reflect, refract_out, refract_in)."""
    cache_dir = cache_dir or CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    paths = {
        "reflect": os.path.join(cache_dir, f"lookup_reflect_{n_samples}.npy"),
        "out": os.path.join(cache_dir, f"lookup_refract_out_{n_samples}.npy"),
        "in": os.path.join(cache_dir, f"lookup_refract_in_{n_samples}.npy"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return tuple(np.load(paths[k]) for k in ("reflect", "out", "in"))

    reflect_t = bake_reflection_table(n_samples)
    refract_out = bake_refraction_table(above_surface=True, n_samples=n_samples)
    refract_in = bake_refraction_table(above_surface=False, n_samples=n_samples)
    np.save(paths["reflect"], reflect_t)
    np.save(paths["out"], refract_out)
    np.save(paths["in"], refract_in)
    return reflect_t, refract_out, refract_in
