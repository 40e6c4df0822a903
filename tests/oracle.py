"""Independent CPU oracle path tracer (pure NumPy megakernel).

This is the SURVEY §4 "golden oracle": a from-scratch re-implementation of
the reference estimator (/root/reference/PathTracer/Shaders/RayGen.slang:9-160,
ClosestHit.slang, Material.slang) that shares NO implementation with
vpt_tpu's wavefront integrator — no jax, no vpt_tpu.render imports.  Tests
render the same scene through both and assert statistical agreement, so an
estimator bug in the wavefront code cannot hide behind a matching golden
image it generated itself.

Architecture is deliberately the megakernel shape of the reference: an outer
Python loop over samples, an inner loop over bounces, vectorized over pixels
with boolean masks.  RNG is the same PCG-RXS-M-XS-32 hash, re-implemented
here in NumPy uint32 arithmetic (draw ORDER differs from the wavefront,
which is fine — agreement is in expectation, not per-sample).

Scope: surfaces (all five BSDF lobes, no energy-compensation tables), mesh
NEE + MIS, constant/image environments WITHOUT importance sampling (tests
run both renderers with enable_sky_mis=False), firefly clamp, Russian
roulette.  Volumes/atmosphere are out of scope.
"""

from __future__ import annotations

import numpy as np

T_MIN = 1e-4
T_MAX = 1e8


# ----------------------------------------------------------------------------
# RNG: PCG hash (Sampler.slang:4-9), NumPy uint32
# ----------------------------------------------------------------------------
def _pcg(x):
    with np.errstate(over="ignore"):
        x = x.astype(np.uint32)
        state = x * np.uint32(747796405) + np.uint32(2891336453)
        word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(277803737)
        return (word >> np.uint32(22)) ^ word


class Rng:
    def __init__(self, pixel_index, sample_index, frame_seed):
        s = _pcg(np.uint32([sample_index ^ 0x9E3779B9]))[0]
        with np.errstate(over="ignore"):
            f = _pcg(np.uint32([frame_seed + s]))[0]
            self.state = (pixel_index.astype(np.uint32) + f).astype(np.uint32)

    def next(self):
        self.state = _pcg(self.state)
        return self.state.astype(np.float64) / 4294967295.0


# ----------------------------------------------------------------------------
# Small vector helpers
# ----------------------------------------------------------------------------
def _dot(a, b):
    return (a * b).sum(-1)


def _norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _reflect(i, n):
    return i - 2.0 * _dot(n, i)[..., None] * n


def _refract(i, n, eta):
    cosi = -_dot(i, n)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    t = eta[..., None] * i + ((eta * cosi - np.sqrt(np.maximum(k, 0.0)))[..., None]) * n
    return np.where((k < 0.0)[..., None], 0.0, t)


def _power_heuristic(a, b):
    a2, b2 = a * a, b * b
    return a2 / np.maximum(a2 + b2, 1e-20)


def _luminance(c):
    return c @ np.array([0.2126, 0.7152, 0.0722])


# ----------------------------------------------------------------------------
# Scene flattening (world-space triangle soup; independent of scene/build.py)
# ----------------------------------------------------------------------------
class FlatScene:
    def __init__(self, scene):
        v0s, n_s, mats, insts = [], [], [], []
        for ii, instance in enumerate(scene.instances):
            mesh = scene.meshes[instance.mesh]
            m = np.asarray(instance.transform, np.float64)
            nm = np.linalg.inv(m[:3, :3]).T
            idx = np.asarray(mesh.indices).reshape(-1, 3)
            p = np.asarray(mesh.positions, np.float64) @ m[:3, :3].T + m[:3, 3]
            nrm = _norm(np.asarray(mesh.normals, np.float64) @ nm.T)
            v0s.append(np.stack([p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]], axis=1))
            n_s.append(np.stack([nrm[idx[:, 0]], nrm[idx[:, 1]], nrm[idx[:, 2]]], axis=1))
            mats.append(np.full(idx.shape[0], instance.material, np.int32))
            insts.append(np.full(idx.shape[0], ii, np.int32))
        verts = np.concatenate(v0s)  # (T, 3 verts, 3)
        self.p0 = verts[:, 0]
        self.e1 = verts[:, 1] - verts[:, 0]
        self.e2 = verts[:, 2] - verts[:, 0]
        self.vn = np.concatenate(n_s)  # (T, 3 verts, 3)
        self.tri_mat = np.concatenate(mats)
        self.tri_inst = np.concatenate(insts)
        self.materials = scene.materials
        self.area = 0.5 * np.linalg.norm(np.cross(self.e1, self.e2), axis=-1)

        # Emissive table: instances whose material emits (build.py:281-305
        # semantics, independently derived).
        em_inst = [
            ii for ii, inst in enumerate(scene.instances)
            if np.any(np.asarray(scene.materials[inst.material].emissive_color) > 0)
        ]
        self.em_inst = np.asarray(em_inst, np.int32)
        self.n_emissive = len(em_inst)
        # Per-entry triangle index lists (global tri ids) and counts.
        self.em_tris = [np.nonzero(self.tri_inst == ii)[0] for ii in em_inst]
        self.em_tcount_by_inst = np.zeros(len(scene.instances))
        for ii, tris in zip(em_inst, self.em_tris):
            self.em_tcount_by_inst[ii] = len(tris)

        env = scene.env_map
        if env is None and self.n_emissive > 0:
            env = np.zeros((2, 2, 3), np.float32)
        self.env = None if env is None else np.asarray(env, np.float64)

    def mat(self, field, ids):
        return np.asarray(
            [getattr(self.materials[int(i)], field) for i in np.atleast_1d(ids)]
        )


def _mat_arrays(fs: FlatScene, furnace: bool):
    """Per-material SoA (applied per-hit via tri_mat indexing)."""
    m = fs.materials
    base = np.array([mm.base_color for mm in m], np.float64)
    emissive = np.array([mm.emissive_color for mm in m], np.float64)
    specular = np.array([getattr(mm, "specular_color", (1, 1, 1)) for mm in m], np.float64)
    metallic = np.array([mm.metallic for mm in m], np.float64)
    rough = np.array([mm.roughness for mm in m], np.float64)
    ior = np.maximum(np.array([mm.ior for mm in m], np.float64), 1.000001)
    trans = np.array([mm.transmission for mm in m], np.float64)
    if furnace:
        base = np.ones_like(base)
        emissive = np.zeros_like(emissive)
        specular = np.ones_like(specular)
    return dict(base=base, emissive=emissive, specular=specular,
                metallic=metallic, rough=rough, ior=ior, trans=trans)


# ----------------------------------------------------------------------------
# Intersection: brute-force Möller–Trumbore over the whole soup
# ----------------------------------------------------------------------------
def _intersect(fs, org, d, t_min=T_MIN, t_max=None, any_hit_tmax=None):
    """Closest hit of (N,3) rays vs all tris. Returns (t, tri, u, v);
    t = -1 on miss.  `any_hit_tmax`: per-ray max distance (still returns the
    closest hit; callers use t>=0 as the blocked test, which is equivalent)."""
    p0, e1, e2 = fs.p0, fs.e1, fs.e2
    pv = np.cross(d[:, None, :], e2[None])  # (N, T, 3)
    det = (e1[None] * pv).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = org[:, None, :] - p0[None]
    u = (tv * pv).sum(-1) * inv
    qv = np.cross(tv, e1[None])
    v = (d[:, None, :] * qv).sum(-1) * inv
    t = (e2[None] * qv).sum(-1) * inv
    tmax = T_MAX if any_hit_tmax is None else any_hit_tmax[:, None]
    ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < tmax)
    t = np.where(ok, t, np.inf)
    j = np.argmin(t, axis=1)
    rows = np.arange(org.shape[0])
    tbest = t[rows, j]
    found = np.isfinite(tbest)
    return (
        np.where(found, tbest, -1.0),
        np.where(found, j, -1),
        u[rows, j],
        v[rows, j],
    )


# ----------------------------------------------------------------------------
# Surface reconstruction (Surface.slang:26-117 semantics, independent code)
# ----------------------------------------------------------------------------
def _surface(fs, tri, u, v, ray_dir):
    tri = np.maximum(tri, 0)
    p0, e1, e2 = fs.p0[tri], fs.e1[tri], fs.e2[tri]
    pos = p0 + u[:, None] * e1 + v[:, None] * e2
    geom_n = _norm(np.cross(e1, e2))
    vn = fs.vn[tri]
    n = _norm(vn[:, 0] * (1 - u - v)[:, None] + vn[:, 1] * u[:, None] + vn[:, 2] * v[:, None])
    view = -ray_dir
    inside = _dot(geom_n, view) < 0
    n = np.where(inside[:, None], -n, n)
    geom_n = np.where(inside[:, None], -geom_n, geom_n)
    # Fixup 1 (Surface.slang:92-100)
    ndotv = _dot(n, view)
    pulled = _norm(n - view * (ndotv - 0.01)[:, None])
    n = np.where((ndotv < 0)[:, None], pulled, n)
    # Fixup 2 (Surface.slang:102-112)
    perfect = _norm(_reflect(-view, n))
    pushed = _norm(n + geom_n * (0.1 + _dot(n, geom_n))[:, None])
    n = np.where((_dot(perfect, geom_n) < 0)[:, None], pushed, n)
    # Tangent frame (reversed cross order after fixups, Surface.slang:115-116)
    up = np.where(
        (np.abs(n[:, 2:3]) < 0.9999999),
        np.broadcast_to([0.0, 0.0, 1.0], n.shape),
        np.broadcast_to([1.0, 0.0, 0.0], n.shape),
    )
    tangent = _norm(np.cross(n, up))
    bitangent = _norm(np.cross(n, tangent))
    return pos, n, geom_n, tangent, bitangent, inside


def _to_tangent(t, b, n, w):
    return np.stack([_dot(w, t), _dot(w, b), _dot(w, n)], axis=-1)


def _to_world(t, b, n, l):
    return l[:, 0:1] * t + l[:, 1:2] * b + l[:, 2:3] * n


# ----------------------------------------------------------------------------
# BSDF (Material.slang:94-387 semantics, independent NumPy)
# ----------------------------------------------------------------------------
def _ggx_d(h, a):
    denom = np.pi * a * a * (h[:, 0] ** 2 / (a * a) + h[:, 1] ** 2 / (a * a) + h[:, 2] ** 2) ** 2
    return 1.0 / np.maximum(denom, 1e-20)


def _smith_g1(v, a):
    vz2 = np.maximum(v[:, 2] ** 2, 1e-20)
    lam = (-1.0 + np.sqrt(1.0 + a * a * (v[:, 0] ** 2 + v[:, 1] ** 2) / vz2)) / 2.0
    return 1.0 / (1.0 + lam)


def _fresnel_dielectric(cos_i, eta):
    sin_t_sq = eta * eta * (1.0 - cos_i * cos_i)
    cos_t = np.sqrt(np.maximum(1.0 - sin_t_sq, 0.0))
    den1 = np.where(np.abs(eta * cos_t + cos_i) < 1e-20, 1e-20, eta * cos_t + cos_i)
    den2 = np.where(np.abs(eta * cos_i + cos_t) < 1e-20, 1e-20, eta * cos_i + cos_t)
    rs = (eta * cos_t - cos_i) / den1
    rp = (eta * cos_i - cos_t) / den2
    return np.where(sin_t_sq > 1.0, 1.0, 0.5 * (rs * rs + rp * rp))


def _schlick(x):
    m = np.clip(1.0 - x, 0.0, 1.0)
    return m ** 5


def _eval_reflection(v, l, f_color, a):
    h = _norm(v + l)
    vdoth = _dot(v, h)
    d = _ggx_d(h, a)
    gv, gl = _smith_g1(v, a), _smith_g1(l, a)
    vz = np.maximum(v[:, 2], 1e-8)
    pdf = (gv * np.maximum(vdoth, 0.0) * d / vz) / np.maximum(4.0 * vdoth, 1e-20)
    brdf = (d * gv * gl / (4.0 * vz))[:, None] * f_color
    bad = l[:, 2] <= 1e-5
    return np.where(bad[:, None], 0.0, brdf), np.where(bad, 0.0, pdf)


def _eval_refraction(v, l, f_color, eta, a):
    h = _norm(eta[:, None] * v + l)
    h = np.where((h[:, 2] < 0)[:, None], -h, h)
    vdoth, ldoth = _dot(v, h), _dot(l, h)
    d = _ggx_d(h, a)
    gv, gl = _smith_g1(v, a), _smith_g1(l, a)
    denom2 = np.maximum((ldoth + eta * vdoth) ** 2, 1e-20)
    eta2 = eta * eta
    vz = np.maximum(np.abs(v[:, 2]), 1e-8)
    pdf = (gv * np.abs(vdoth) * d / vz) * (eta2 * np.abs(ldoth)) / denom2
    bsdf = ((d * gv * gl * eta2 / denom2) * (np.abs(vdoth) * np.abs(ldoth) / vz))[:, None] * f_color
    bad = l[:, 2] >= 1e-5
    return np.where(bad[:, None], 0.0, bsdf), np.where(bad, 0.0, pdf)


def _eval_bsdf(mat, v, l):
    """mat: dict of per-ray material arrays (base(N,3), specular(N,3),
    metallic, rough, eta, trans).  Returns (bxdf (N,3), pdf (N,))."""
    p_metal = mat["metallic"]
    p_diel = (1 - mat["metallic"]) * (1 - mat["trans"])
    p_glass = (1 - mat["metallic"]) * mat["trans"]
    total = np.maximum(p_metal + p_diel + p_glass, 1e-20)
    p_metal, p_diel, p_glass = p_metal / total, p_diel / total, p_glass / total
    a = np.maximum(mat["rough"], 1e-5)
    eta = mat["eta"]

    refracted = l[:, 2] < 0
    h_refl = _norm(v + l)
    h_refr = _norm(eta[:, None] * v + l)
    h_refr = np.where((h_refr[:, 2] < 0)[:, None], -h_refr, h_refr)
    h = np.where(refracted[:, None], h_refr, h_refl)
    vdoth, ldoth = _dot(v, h), _dot(l, h)
    valid_refr = ((vdoth > 0) & (ldoth < 0)) | ((vdoth < 0) & (ldoth > 0))
    f_diel = _fresnel_dielectric(np.abs(vdoth), eta)

    bxdf = np.zeros_like(v)
    pdf = np.zeros(v.shape[0])
    nr = ~refracted

    f_metal = mat["base"] + (mat["specular"] - mat["base"]) * _schlick(_dot(v, h_refl))[:, None]
    mb, mp = _eval_reflection(v, l, f_metal, a)
    bxdf += np.where(nr[:, None], mb * p_metal[:, None], 0.0)
    pdf += np.where(nr, mp * p_metal, 0.0)

    lz = l[:, 2]
    db = mat["base"] * (lz / np.pi)[:, None]
    dp = np.where(lz > 0, lz / np.pi, 0.0)
    w_d = p_diel * (1 - f_diel)
    bxdf += np.where(nr[:, None], db * w_d[:, None], 0.0)
    pdf += np.where(nr, dp * w_d, 0.0)

    sb, sp = _eval_reflection(v, l, mat["specular"], a)
    w_s = p_diel * f_diel
    bxdf += np.where(nr[:, None], sb * w_s[:, None], 0.0)
    pdf += np.where(nr, sp * w_s, 0.0)

    gb, gp = _eval_reflection(v, l, mat["specular"], a)
    w_gr = p_glass * f_diel
    bxdf += np.where(nr[:, None], gb * w_gr[:, None], 0.0)
    pdf += np.where(nr, gp * w_gr, 0.0)

    rb, rp_ = _eval_refraction(v, l, mat["base"], eta, a)
    w_gt = p_glass * (1 - f_diel)
    okr = refracted & valid_refr
    bxdf += np.where(okr[:, None], rb * w_gt[:, None], 0.0)
    pdf += np.where(okr, rp_ * w_gt, 0.0)
    return bxdf, pdf


def _sample_vndf(rng, v, a):
    """Isotropic GGX VNDF (Sampler.slang:141-166)."""
    u1, u2 = rng.next(), rng.next()
    vh = _norm(np.stack([a * v[:, 0], a * v[:, 1], np.abs(v[:, 2])], axis=-1))
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv_len = 1.0 / np.sqrt(np.maximum(lensq, 1e-20))
    t1 = np.where(
        (lensq > 0)[:, None],
        np.stack([-vh[:, 1], vh[:, 0], np.zeros_like(lensq)], axis=-1) * inv_len[:, None],
        np.broadcast_to([1.0, 0.0, 0.0], vh.shape),
    )
    t2 = np.cross(vh, t1)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1 + vh[:, 2])
    p2 = (1 - s) * np.sqrt(np.maximum(1 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[:, None] * t1 + p2[:, None] * t2
        + np.sqrt(np.maximum(0.0, 1 - p1 * p1 - p2 * p2))[:, None] * vh
    )
    return _norm(np.stack([a * nh[:, 0], a * nh[:, 1], np.maximum(nh[:, 2], 0.0)], axis=-1))


def _sample_bsdf(rng, mat, v, h):
    p_metal = mat["metallic"]
    p_diel = (1 - mat["metallic"]) * (1 - mat["trans"])
    p_glass = (1 - mat["metallic"]) * mat["trans"]
    total = np.maximum(p_metal + p_diel + p_glass, 1e-20)
    p_metal, p_diel = p_metal / total, p_diel / total

    f_diel = _fresnel_dielectric(_dot(v, h), mat["eta"])
    x1, x2 = rng.next(), rng.next()
    # Cosine hemisphere via normalize(uniform_sphere + z) (Sampler.slang:135-139)
    u1, u2 = rng.next(), rng.next()
    th = 2 * np.pi * u1
    z = 1 - 2 * u2
    r = np.sqrt(np.maximum(1 - z * z, 0.0))
    sph = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    l_diff = _norm(sph + np.array([0.0, 0.0, 1.0]))

    l_refl = _norm(_reflect(-v, h))
    l_refr = _norm(_refract(-v, h, mat["eta"]))

    pick_metal = x1 < p_metal
    pick_diel = ~pick_metal & (x1 < p_metal + p_diel)
    pick_glass = ~pick_metal & ~pick_diel
    refl_branch = x2 < f_diel
    use_reflect = pick_metal | (refl_branch & (pick_diel | pick_glass))
    use_diffuse = pick_diel & ~refl_branch
    l = np.where(use_reflect[:, None], l_refl, np.where(use_diffuse[:, None], l_diff, l_refr))
    refracted = pick_glass & ~refl_branch
    invalid = (~refracted & (l[:, 2] < 0)) | (refracted & (l[:, 2] >= 0))
    bxdf, pdf = _eval_bsdf(mat, v, l)
    return l, np.where(invalid[:, None], 0.0, bxdf), np.where(invalid, 0.0, pdf)


# ----------------------------------------------------------------------------
# Environment (equirect lookup, Miss.slang:18-57; nearest texel is enough
# for the low-frequency test envs)
# ----------------------------------------------------------------------------
def _env_radiance(fs, d):
    if fs.env is None:
        return np.zeros((d.shape[0], 3))
    h, w = fs.env.shape[:2]
    gamma = np.arcsin(np.clip(d[:, 1], -1, 1))
    theta = np.arctan2(d[:, 0], -d[:, 2])
    u = theta * (0.5 / np.pi) + 0.5
    v = gamma / np.pi + 0.5
    x = np.clip((u * w).astype(int), 0, w - 1)
    y = np.clip((v * h).astype(int), 0, h - 1)
    return fs.env[y, x, :3]


# ----------------------------------------------------------------------------
# The oracle renderer
# ----------------------------------------------------------------------------
def render_oracle(
    scene,
    width,
    height,
    spp,
    max_depth=8,
    frame_seed=1,
    furnace_test_mode=False,
    show_env_map_directly=True,
    max_luminance=500.0,
    emissive_pdf_bias=0.0,
    fov_deg=None,
):
    """Render `scene` with the oracle estimator.  Returns (H, W, 3) float64.

    Mirrors RayGen.slang:33-130 / ClosestHit.slang semantics: mesh NEE with
    the power heuristic, emissive-hit MIS with the d²/(N·T·A·cosθ) pdf,
    firefly clamp past the first bounce, Russian roulette, no sky MIS.
    """
    fs = FlatScene(scene)
    mats = _mat_arrays(fs, furnace_test_mode)
    n = width * height
    pix = np.arange(n, dtype=np.uint32)
    px = (pix % width).astype(np.float64)
    py = (pix // width).astype(np.float64)

    view_inv = np.linalg.inv(np.asarray(scene.camera_view, np.float64))
    fov = np.radians(scene.camera_fov_deg if fov_deg is None else fov_deg)
    # Perspective with the Vulkan Y flip (camera.py / RayGen.slang contract):
    # NDC d in [-1,1]^2, target = proj_inverse @ (d, 1, 1).
    f = 1.0 / np.tan(fov / 2.0)
    aspect = width / height

    accum = np.zeros((n, 3))
    em_total = max(fs.n_emissive, 1)

    for s in range(spp):
        rng = Rng(pix, s, frame_seed)
        jx, jy = rng.next() - 0.5, rng.next() - 0.5
        ndc_x = (px + 0.5 + jx) / width * 2 - 1
        ndc_y = (py + 0.5 + jy) / height * 2 - 1
        # proj_inverse of the GLM/Vulkan perspective: x = ndc_x*aspect/f,
        # y = -ndc_y/f, z = -1 (normalized before the view transform).
        tgt = _norm(np.stack([ndc_x * aspect / f, -ndc_y / f, -np.ones(n)], axis=-1))
        d = tgt @ view_inv[:3, :3].T
        org = np.broadcast_to(view_inv[:3, 3], (n, 3)).copy()
        # DoF draws (strength 0 -> no-op, but keep the chain shape)
        rng.next(), rng.next()

        throughput = np.ones((n, 3))
        radiance = np.zeros((n, 3))
        alive = np.ones(n, bool)
        prev_pdf = np.ones(n)

        for depth in range(max_depth):
            t, tri, u, v = _intersect(fs, org, d)
            hit = (t >= 0) & alive
            missed = alive & ~hit

            emitted = np.zeros((n, 3))
            # Miss shading
            env = _env_radiance(fs, d)
            if furnace_test_mode:
                env = np.ones_like(env)
            if not show_env_map_directly and depth == 0:
                env = np.zeros_like(env)
            emitted[missed] = env[missed]

            # Surface
            pos, nrm, geom_n, tang, bita, inside = _surface(fs, tri, u, v, d)
            mat_id = fs.tri_mat[np.maximum(tri, 0)]
            mrow = {k: mats[k][mat_id] for k in mats}
            mrow["eta"] = np.where(inside, mrow["ior"], 1.0 / mrow["ior"])
            is_light = (mrow["emissive"] > 0).any(-1)
            view_t = _to_tangent(tang, bita, nrm, -d)

            # ---- NEE: sample one emissive triangle (Sampler.slang:348-422)
            if fs.n_emissive > 0:
                u_mesh = rng.next()
                mesh_i = np.minimum((u_mesh * fs.n_emissive).astype(int), fs.n_emissive - 1)
                u_tri = rng.next()
                tcounts = np.array([len(fs.em_tris[i]) for i in mesh_i])
                tri_i = np.minimum((u_tri * tcounts).astype(int), tcounts - 1)
                gtri = np.array([fs.em_tris[mi][ti] for mi, ti in zip(mesh_i, tri_i)])
                xi1, xi2 = rng.next(), rng.next()
                su1 = np.sqrt(xi1)
                # b0 = 1-su1 weights p0; p = p0 + b1*e1 + b2*e2
                b1 = xi2 * su1
                b2 = su1 - b1
                lp = fs.p0[gtri] + b1[:, None] * fs.e1[gtri] + b2[:, None] * fs.e2[gtri]
                to_l = _norm(lp - pos)
                lnrm = _norm(np.cross(fs.e2[gtri], fs.e1[gtri]))
                larea = fs.area[gtri]
                dist_sq = _dot(lp - pos, lp - pos)
                cos_t = np.abs(_dot(lnrm, to_l))
                denom = fs.n_emissive * tcounts * larea * cos_t
                l_pdf = np.where(denom > 0, dist_sq / np.maximum(denom, 1e-20), 0.0)
                l_color = mats["emissive"][fs.tri_mat[gtri]]
                l_dist = np.sqrt(dist_sq)

                need = hit & ~is_light & (l_pdf > 0)
                sh_org = pos + to_l * 1e-2
                sh_t, _, _, _ = _intersect(
                    fs, sh_org, to_l, any_hit_tmax=np.maximum(l_dist - 2e-2, T_MIN)
                )
                vis = sh_t < 0
                l_tan = _to_tangent(tang, bita, nrm, to_l)
                l_bxdf, l_eval_pdf = _eval_bsdf(mrow, view_t, l_tan)
                ok = need & vis & (l_eval_pdf > 0)
                contrib = (
                    l_bxdf * l_color / np.maximum(l_pdf, 1e-20)[:, None]
                    * _power_heuristic(l_pdf, l_eval_pdf)[:, None]
                )
                emitted += np.where(ok[:, None], contrib, 0.0)

            # ---- Emissive surface hit (ClosestHit.slang:265-317)
            if fs.n_emissive > 0:
                direct = hit & (depth == 0) & is_light
                emitted += np.where(direct[:, None], mrow["emissive"], 0.0)
                later = hit & (depth > 0) & is_light
                dist_sq_h = _dot(pos - org, pos - org)
                cos_h = np.abs(_dot(nrm, _norm(org - pos)))
                tc = np.maximum(fs.em_tcount_by_inst[fs.tri_inst[np.maximum(tri, 0)]], 1.0)
                area_h = fs.area[np.maximum(tri, 0)]
                lpdf_h = (1.0 / em_total) * (1.0 / tc) * (1.0 / np.maximum(area_h, 1e-20)) * (
                    dist_sq_h / np.maximum(cos_h, 1e-20)
                )
                lpdf_h = np.maximum(lpdf_h, emissive_pdf_bias)
                emitted += np.where(
                    later[:, None],
                    mrow["emissive"] * _power_heuristic(prev_pdf, lpdf_h)[:, None],
                    0.0,
                )

            # ---- BSDF sample
            h = _sample_vndf(rng, view_t, np.maximum(mrow["rough"], 1e-5))
            l_tan, bxdf_s, pdf_s = _sample_bsdf(rng, mrow, view_t, h)
            was_refr = l_tan[:, 2] < 0
            new_d = _to_world(tang, bita, nrm, l_tan)
            leak = ~was_refr & (_dot(new_d, geom_n) < 0)
            pdf_s = np.where(leak, 0.0, pdf_s)
            bxdf_s = np.where(leak[:, None], 0.0, bxdf_s)

            # ---- Contribution + firefly clamp (RayGen.slang:92-102)
            contribution = emitted * throughput
            lum = _luminance(contribution)
            scale = max_luminance / np.maximum(lum, max_luminance)
            no_clamp = (depth == 0) & hit
            contribution = np.where(no_clamp[:, None], contribution, contribution * scale[:, None])
            radiance += np.where(alive[:, None], contribution, 0.0)

            # ---- Throughput + next ray
            invalid = hit & (pdf_s <= 0)
            factor = np.where(hit[:, None], bxdf_s / np.maximum(pdf_s, 1e-20)[:, None], 1.0)
            throughput *= np.where(alive[:, None], factor, 1.0)
            org = np.where(
                hit[:, None],
                pos + nrm * np.where(was_refr, -1e-3, 1e-3)[:, None],
                org,
            )
            d = np.where(hit[:, None], _norm(new_d), d)
            alive = alive & hit & ~invalid
            if depth + 1 >= max_depth or not alive.any():
                # Russian roulette is still applied below for parity of the
                # expected estimator, but the loop exit makes it moot.
                pass

            # ---- Russian roulette (RayGen.slang:105-113)
            p = np.minimum(throughput.max(-1), 1.0)
            u_rr = rng.next()
            alive = alive & ~(p < u_rr)
            throughput = np.where(alive[:, None], throughput / np.maximum(p, 1e-20)[:, None], throughput)
            if not alive.any():
                break

        bad = ~np.isfinite(radiance).all(-1)
        radiance[bad] = 0.0
        accum += radiance

    return (accum / spp).reshape(height, width, 3)
