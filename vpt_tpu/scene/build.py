"""Scene compilation: host `Scene` -> device `SceneData` + static `SceneMeta`.

TPU-native equivalent of the reference's SetScene GPU resource build
(PathTracer.cpp:158-676): each unique mesh gets one local-space BVH +
cluster-block build (the BLAS), instances contribute world AABBs and
world->local transforms (the TLAS), and the material/emissive/env/texture
SoA arrays replace the 20-binding descriptor set.  Shading-side triangle
attributes live in a per-instance "virtual id" table.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh
from vpt_tpu.accel.cluster import assemble_clusters, build_mesh_clusters
from vpt_tpu.scene.envmap import constant_environment, prepare_environment
from vpt_tpu.scene.types import (
    EmissiveTable,
    EnvMapData,
    MaterialTable,
    Scene,
    SceneData,
    SceneMeta,
    VolumeTable,
)

BRUTE_FORCE_MAX_TRIS = 1024


def build_volume_table(volumes) -> VolumeTable:
    """Host Volume list -> device VolumeTable (VolumeGPU upload equivalent,
    PathTracer.cpp:1334-…).  Heterogeneous grids are padded to a common shape
    and 32^3 block max-densities are precomputed for empty-space skipping."""
    if not volumes:
        return empty_volume_table()
    nv = len(volumes)

    def f3(get):
        return jnp.asarray(np.array([get(v) for v in volumes], np.float32))

    def f1(get):
        return jnp.asarray(np.array([get(v) for v in volumes], np.float32))

    def i1(get):
        return jnp.asarray(np.array([get(v) for v in volumes], np.int32))

    corners = [v.world_corners() for v in volumes]

    # Collect heterogeneous grids, padded to the max extent.
    grid_vols = [i for i, v in enumerate(volumes) if v.density_grid is not None]
    grid_index = np.full(nv, -1, np.int32)
    max_density = np.zeros(nv, np.float32)
    if grid_vols:
        dmax = max(volumes[i].density_grid.shape[0] for i in grid_vols)
        hmax = max(volumes[i].density_grid.shape[1] for i in grid_vols)
        wmax = max(volumes[i].density_grid.shape[2] for i in grid_vols)
        grids = np.zeros((len(grid_vols), dmax, hmax, wmax), np.float32)
        temps = np.zeros_like(grids)
        blocks = np.zeros((len(grid_vols), 32, 32, 32), np.float32)
        for g, i in enumerate(grid_vols):
            dg = np.asarray(volumes[i].density_grid, np.float32)
            grids[g, : dg.shape[0], : dg.shape[1], : dg.shape[2]] = dg
            if volumes[i].temperature_grid is not None:
                tg = np.asarray(volumes[i].temperature_grid, np.float32)
                tnorm = tg / max(tg.max(), 1e-20)
                temps[g, : tg.shape[0], : tg.shape[1], : tg.shape[2]] = tnorm
            grid_index[i] = g
            max_density[i] = float(dg.max())
            # 32^3 max-density blocks over the *normalized* grid (the device
            # multiplies by volume density; values normalized by grid max).
            norm = dg / max(float(dg.max()), 1e-20)
            d, h, w = norm.shape
            for bz in range(32):
                for by in range(32):
                    for bx in range(32):
                        z0, z1 = bz * d // 32, max((bz + 1) * d // 32, bz * d // 32 + 1)
                        y0, y1 = by * h // 32, max((by + 1) * h // 32, by * h // 32 + 1)
                        x0, x1 = bx * w // 32, max((bx + 1) * w // 32, bx * w // 32 + 1)
                        # Dilate by one voxel: the sampler jitters +-1 voxel.
                        blk = norm[
                            max(z0 - 1, 0) : min(z1 + 1, d),
                            max(y0 - 1, 0) : min(y1 + 1, h),
                            max(x0 - 1, 0) : min(x1 + 1, w),
                        ]
                        # Block layout: x + y*32 + z*32*32 with world y flipped
                        # like the sampler's normalized position
                        blocks[g, bz, 31 - by, bx] = blk.max() if blk.size else 0.0
        density_grids = jnp.asarray(grids)
        temperature_grids = jnp.asarray(temps)
        max_blocks = jnp.asarray(blocks)
    else:
        density_grids = jnp.zeros((0, 1, 1, 1), jnp.float32)
        temperature_grids = jnp.zeros((0, 1, 1, 1), jnp.float32)
        max_blocks = jnp.zeros((0, 32, 32, 32), jnp.float32)

    return VolumeTable(
        corner_min=jnp.asarray(np.stack([c[0] for c in corners])),
        corner_max=jnp.asarray(np.stack([c[1] for c in corners])),
        color=f3(lambda v: v.color),
        emissive_color=f3(lambda v: v.emissive_color),
        temperature_color=f3(lambda v: v.temperature_color),
        density=f1(lambda v: v.density),
        anisotropy=f1(lambda v: v.anisotropy),
        alpha=f1(lambda v: v.alpha),
        droplet_size=f1(lambda v: v.droplet_size),
        density_grid_index=jnp.asarray(grid_index),
        max_density=jnp.asarray(max_density),
        use_blackbody=i1(lambda v: int(v.use_blackbody)),
        has_temperature=i1(lambda v: int(v.temperature_grid is not None)),
        temperature_gamma=f1(lambda v: v.temperature_gamma),
        temperature_scale=f1(lambda v: v.temperature_scale),
        emissive_color_gamma=f1(lambda v: v.emissive_color_gamma),
        kelvin_min=f1(lambda v: v.kelvin_min),
        kelvin_max=f1(lambda v: v.kelvin_max),
        approx_cloud_scattering=i1(lambda v: int(v.approximated_scattering_for_clouds)),
        approx_scattering_falloff=f1(lambda v: v.approximated_scattering_falloff),
        grid_sharpness=f1(lambda v: v.grid_sharpness),
        density_grids=density_grids,
        temperature_grids=temperature_grids,
        max_density_blocks=max_blocks,
    )


def empty_volume_table() -> VolumeTable:
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    g = jnp.zeros((0, 1, 1, 1), jnp.float32)
    return VolumeTable(
        corner_min=z3, corner_max=z3, color=z3, emissive_color=z3,
        temperature_color=z3, density=z, anisotropy=z, alpha=z, droplet_size=z,
        density_grid_index=zi, max_density=z, use_blackbody=zi,
        has_temperature=zi, temperature_gamma=z, temperature_scale=z,
        emissive_color_gamma=z, kelvin_min=z, kelvin_max=z,
        approx_cloud_scattering=zi, approx_scattering_falloff=z,
        grid_sharpness=z, density_grids=g, temperature_grids=g,
        max_density_blocks=jnp.zeros((0, 32, 32, 32), jnp.float32),
    )


def build_material_table(materials) -> MaterialTable:
    def arr3(field):
        return jnp.asarray(np.array([getattr(m, field) for m in materials], np.float32))

    def arr1(field):
        return jnp.asarray(np.array([getattr(m, field) for m in materials], np.float32))

    def arri(field):
        return jnp.asarray(np.array([getattr(m, field) for m in materials], np.int32))

    from vpt_tpu.scene.types import MAT_ATTR_COLS

    attr = np.zeros((len(materials), MAT_ATTR_COLS), np.float32)
    for i, m in enumerate(materials):
        attr[i, 0:3] = m.base_color
        attr[i, 3:6] = m.emissive_color
        attr[i, 6:9] = m.specular_color
        attr[i, 9:12] = m.medium_color
        attr[i, 12:15] = m.medium_emissive_color
        attr[i, 15:23] = [
            m.metallic, m.roughness, m.ior, m.transmission, m.anisotropy,
            m.anisotropy_rotation, m.medium_density, m.medium_anisotropy,
        ]
        attr[i, 23:28] = [
            m.base_color_texture, m.normal_texture, m.roughness_texture,
            m.metallic_texture, m.emissive_texture,
        ]

    return MaterialTable(
        attr=jnp.asarray(attr),
        base_color=arr3("base_color"),
        emissive_color=arr3("emissive_color"),
        specular_color=arr3("specular_color"),
        medium_color=arr3("medium_color"),
        medium_emissive_color=arr3("medium_emissive_color"),
        metallic=arr1("metallic"),
        roughness=arr1("roughness"),
        ior=arr1("ior"),
        transmission=arr1("transmission"),
        anisotropy=arr1("anisotropy"),
        anisotropy_rotation=arr1("anisotropy_rotation"),
        medium_density=arr1("medium_density"),
        medium_anisotropy=arr1("medium_anisotropy"),
        base_color_texture=arri("base_color_texture"),
        normal_texture=arri("normal_texture"),
        roughness_texture=arri("roughness_texture"),
        metallic_texture=arri("metallic_texture"),
        emissive_texture=arri("emissive_texture"),
    )


def pack_textures(textures) -> jnp.ndarray:
    """Concatenate all textures row-major into one flat RGBA8 pool:
    (P,) uint32 with one packed texel per element (r | g<<8 | b<<16 |
    a<<24).  Memory is exactly the scene's texel count — no pad-to-max
    blowup (a real Sponza mixes 1x1 defaults with 2K maps).  Sources are
    float in [0,1]; quantization to 8 bits matches the reference's RGBA8
    texture images (PathTracer.cpp:227-332)."""
    chunks = []
    for t in textures:
        t = np.asarray(t, np.float32)
        if t.shape[-1] == 3:
            t = np.concatenate([t, np.ones_like(t[..., :1])], axis=-1)
        q = np.clip(np.rint(t * 255.0), 0, 255).astype(np.uint32)
        packed = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
        chunks.append(packed.reshape(-1))
    pool = np.concatenate(chunks) if chunks else np.zeros(1, np.uint32)
    # Pad to a lane multiple so the gather table tiles cleanly.
    pad = (-len(pool)) % 128
    if pad:
        pool = np.concatenate([pool, np.zeros(pad, np.uint32)])
    return jnp.asarray(pool)


def texture_dims(textures) -> jnp.ndarray:
    """(K, 3) i32 (height, width, pool offset) of each packed texture."""
    rows = []
    off = 0
    for t in textures:
        h, w = t.shape[0], t.shape[1]
        rows.append([h, w, off])
        off += h * w
    return jnp.asarray(np.array(rows, np.int32))


def compile_scene(scene: Scene, lookup_tables=None):
    """Build device arrays.  Returns (SceneData, SceneMeta, aux) where aux
    holds host-side extras (texture dims, camera matrices)."""
    # ---- per-mesh BLAS (mesh-local space, shared across instances) --------
    # This replaces the reference's per-mesh BLAS + TLAS instance list
    # (PathTracer.cpp:433-502): each unique mesh gets ONE local-space BVH +
    # cluster-block build; instances only contribute transformed cluster
    # AABBs and a world->local affine the intersector applies to rays.
    from vpt_tpu.accel import cluster as _cluster_mod

    unique_meshes = sorted({inst.mesh for inst in scene.instances})
    mesh_slot = {mi: j for j, mi in enumerate(unique_meshes)}
    mesh_cache = {}
    for mi in unique_meshes:
        mesh = scene.meshes[mi]
        idx = np.asarray(mesh.indices).reshape(-1, 3)
        lv0 = np.asarray(mesh.positions, np.float32)[idx[:, 0]]
        lv1 = np.asarray(mesh.positions, np.float32)[idx[:, 1]]
        lv2 = np.asarray(mesh.positions, np.float32)[idx[:, 2]]
        bvh_m = build_bvh(lv0, lv1, lv2)
        order_m = bvh_m.tri_order
        t = lv0.shape[0]
        inv_perm_m = np.empty(t, np.int32)
        inv_perm_m[order_m] = np.arange(t, dtype=np.int32)
        mc = build_mesh_clusters(
            bvh_m, lv0[order_m], (lv1 - lv0)[order_m], (lv2 - lv0)[order_m],
            cluster_size=_cluster_mod.CLUSTER_SIZE,
        )
        nrm = np.asarray(mesh.normals, np.float32)
        uv = np.asarray(mesh.uvs, np.float32)
        mesh_cache[mi] = dict(
            order=order_m, inv_perm=inv_perm_m, mc=mc,
            lp=(lv0[order_m], lv1[order_m], lv2[order_m]),
            ln=(nrm[idx[:, 0]][order_m], nrm[idx[:, 1]][order_m], nrm[idx[:, 2]][order_m]),
            luv=(uv[idx[:, 0]][order_m], uv[idx[:, 1]][order_m], uv[idx[:, 2]][order_m]),
        )

    # ---- per-instance virtual triangle arrays (world space) ---------------
    # Virtual slot v = virt_base[instance] + mesh-local reordered slot; the
    # intersector reports hits as virtual ids, shading gathers these rows.
    v0s, v1s, v2s = [], [], []
    n0s, n1s, n2s = [], [], []
    uv0s, uv1s, uv2s = [], [], []
    mats, locals_, insts = [], [], []
    virt_base = []
    instance_specs = []
    offset = 0
    for ii, inst in enumerate(scene.instances):
        cache = mesh_cache[inst.mesh]
        m = np.asarray(inst.transform, np.float32)
        nrm_m = np.linalg.inv(m[:3, :3]).T
        p0l, p1l, p2l = cache["lp"]
        p0w = p0l @ m[:3, :3].T + m[:3, 3]
        p1w = p1l @ m[:3, :3].T + m[:3, 3]
        p2w = p2l @ m[:3, :3].T + m[:3, 3]

        def w_nrm(nl):
            nw = nl @ nrm_m.T
            return nw / np.maximum(np.linalg.norm(nw, axis=-1, keepdims=True), 1e-20)

        v0s.append(p0w); v1s.append(p1w); v2s.append(p2w)
        n0s.append(w_nrm(cache["ln"][0]))
        n1s.append(w_nrm(cache["ln"][1]))
        n2s.append(w_nrm(cache["ln"][2]))
        uv0s.append(cache["luv"][0]); uv1s.append(cache["luv"][1]); uv2s.append(cache["luv"][2])
        t = p0l.shape[0]
        mats.append(np.full(t, inst.material, np.int32))
        locals_.append(cache["order"].astype(np.int32))  # original PrimitiveIndex
        insts.append(np.full(t, ii, np.int32))
        virt_base.append(offset)
        instance_specs.append((mesh_slot[inst.mesh], inst.transform, offset))
        offset += t

    v0 = np.concatenate(v0s).astype(np.float32)
    v1 = np.concatenate(v1s).astype(np.float32)
    v2 = np.concatenate(v2s).astype(np.float32)
    n0 = np.concatenate(n0s).astype(np.float32)
    n1 = np.concatenate(n1s).astype(np.float32)
    n2 = np.concatenate(n2s).astype(np.float32)
    uv0 = np.concatenate(uv0s).astype(np.float32)
    uv1 = np.concatenate(uv1s).astype(np.float32)
    uv2 = np.concatenate(uv2s).astype(np.float32)
    tri_mat = np.concatenate(mats)
    tri_local = np.concatenate(locals_)
    tri_inst = np.concatenate(insts)
    n_tris = v0.shape[0]

    def reorder_pad(a, pad_value=0.0):
        # Arrays are already in virtual (per-instance reordered) order; just
        # add the LEAF_SIZE zero pad rows that make clamped gathers safe.
        pad = np.full((LEAF_SIZE,) + a.shape[1:], pad_value, a.dtype)
        return np.concatenate([a, pad])

    tri_p0 = reorder_pad(v0)
    tri_e1 = reorder_pad(v1 - v0)
    tri_e2 = reorder_pad(v2 - v0)

    clusters = assemble_clusters(
        [mesh_cache[mi]["mc"] for mi in unique_meshes], instance_specs
    )

    # ---- emissive table ---------------------------------------------------
    em_instances = []
    for ii, inst in enumerate(scene.instances):
        em = np.asarray(scene.materials[inst.material].emissive_color, np.float32)
        if (em > 0.0).any():
            em_instances.append(ii)
    em_count = len(em_instances)
    inst_to_entry = np.full(len(scene.instances), -1, np.int32)
    em_inst = np.zeros(max(em_count, 1), np.int32)
    em_mat = np.zeros(max(em_count, 1), np.int32)
    em_cnt = np.zeros(max(em_count, 1), np.int32)
    em_off = np.zeros(max(em_count, 1), np.int32)
    slots = []
    cursor = 0
    for e, ii in enumerate(em_instances):
        inst = scene.instances[ii]
        t = scene.meshes[inst.mesh].n_tris
        inst_to_entry[ii] = e
        em_inst[e] = ii
        em_mat[e] = inst.material
        em_cnt[e] = t
        em_off[e] = cursor
        slots.append(virt_base[ii] + mesh_cache[inst.mesh]["inv_perm"])
        cursor += t
    slot_table = np.concatenate(slots) if slots else np.zeros(1, np.int32)

    # tri_rows is filled in below once tri_attr exists (NEE gathers from
    # that small table instead of the full (n_tris, 32) tri_attr).
    emissive = EmissiveTable(
        attr=jnp.asarray(
            np.stack([em_cnt, em_off, em_inst, em_mat], axis=-1).astype(np.float32)
        ),
        instance=jnp.asarray(em_inst),
        material=jnp.asarray(em_mat),
        tri_count=jnp.asarray(em_cnt),
        offset=jnp.asarray(em_off),
        slot_table=jnp.asarray(slot_table),
        inst_to_entry=jnp.asarray(inst_to_entry),
        tri_rows=None,
    )

    # ---- env map ----------------------------------------------------------
    if scene.env_map is not None:
        env = prepare_environment(scene.env_map)
    elif em_count > 0:
        # Scene brings its own lights; keep the sky dark.
        env = constant_environment((0.0, 0.0, 0.0))
    else:
        # The reference always loads a default HDR (PathTracer.h:208); use
        # the procedural stand-in so light-less scenes aren't black.
        from vpt_tpu.scene.envmap import default_sky

        env = prepare_environment(default_sky())
    env = EnvMapData(*(jnp.asarray(x) for x in env))

    # ---- lookup tables -> Chebyshev fits (gather-free BSDF lookups) -------
    from vpt_tpu.render import lookup_fit

    if lookup_tables is None:
        lut_reflect = jnp.asarray(lookup_fit.constant_fit(1.0))
        lut_refr_out = lut_reflect
        lut_refr_in = lut_reflect
    else:
        lut_reflect, lut_refr_out, lut_refr_in = (
            jnp.asarray(t if t.ndim == 3 and t.shape[0] <= 16 else lookup_fit.fit_table(np.asarray(t)))
            for t in lookup_tables
        )

    # ---- packed per-triangle attribute rows (single-gather shading) -------
    from vpt_tpu.scene.types import TRI_ATTR_COLS

    em_tcount_by_inst = np.zeros(len(scene.instances), np.float32)
    for e, ii in enumerate(em_instances):
        em_tcount_by_inst[ii] = float(em_cnt[e])
    tp = tri_p0.shape[0]
    tri_attr = np.zeros((tp, TRI_ATTR_COLS), np.float32)
    tri_attr[:, 0:3] = tri_p0
    tri_attr[:, 3:6] = tri_e1
    tri_attr[:, 6:9] = tri_e2
    tri_attr[:, 9:12] = reorder_pad(n0)
    tri_attr[:, 12:15] = reorder_pad(n1)
    tri_attr[:, 15:18] = reorder_pad(n2)
    tri_attr[:, 18:20] = reorder_pad(uv0)
    tri_attr[:, 20:22] = reorder_pad(uv1)
    tri_attr[:, 22:24] = reorder_pad(uv2)
    tri_attr[:, 24] = reorder_pad(tri_mat, 0).astype(np.float32)
    tri_attr[:, 25] = reorder_pad(tri_local, -1).astype(np.float32)
    inst_padded = reorder_pad(tri_inst, -1)
    tri_attr[:, 26] = inst_padded.astype(np.float32)
    tri_attr[:, 27] = np.where(
        inst_padded >= 0, em_tcount_by_inst[np.maximum(inst_padded, 0)], 0.0
    )
    # Emissive NEE rows: the slot_table triangles' attr rows as their own
    # small table, so lights.sample_emissive_triangle's per-lane gather
    # reads a few-hundred-row array instead of the full tri_attr (a
    # full-table (N, 32) row gather is HBM-latency-bound: ~135 ms per
    # 512^2 dispatch measured vs ~15 ms from small tables).
    emissive = emissive._replace(
        tri_rows=jnp.asarray(tri_attr[np.clip(slot_table, 0, tp - 1)])
    )

    data = SceneData(
        tri_p0=jnp.asarray(tri_p0),
        tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2),
        tri_attr=jnp.asarray(tri_attr),
        clusters=clusters,
        materials=build_material_table(scene.materials),
        emissive=emissive,
        env=env,
        textures=pack_textures(scene.textures),
        texture_dims=texture_dims(scene.textures),
        volumes=empty_volume_table(),
        lookup_reflect=lut_reflect,
        lookup_refract_out=lut_refr_out,
        lookup_refract_in=lut_refr_in,
    )

    world_lo = np.minimum(np.minimum(v0.min(0), v1.min(0)), v2.min(0))
    world_hi = np.maximum(np.maximum(v0.max(0), v1.max(0)), v2.max(0))
    diag = float(np.linalg.norm(world_hi - world_lo))
    CORNELL_DIAG = 3.4641016  # 2-unit cube: all epsilons tuned at this scale
    meta = SceneMeta(
        n_tris=n_tris,
        n_instances=len(scene.instances),
        n_materials=len(scene.materials),
        n_emissive=em_count,
        n_volumes=0,
        n_het_volumes=0,
        use_brute_force=n_tris <= BRUTE_FORCE_MAX_TRIS,
        has_textures=any(
            t.shape[0] > 1 or t.shape[1] > 1 for t in scene.textures
        ),
        name=scene.name,
        scene_scale=diag / CORNELL_DIAG,
        scene_center=tuple(float(x) for x in (world_lo + world_hi) * 0.5),
    )

    aux = {
        "texture_dims": texture_dims(scene.textures),
        "camera_view": scene.camera_view,
        "camera_fov_deg": scene.camera_fov_deg,
        "camera_aspect": scene.camera_aspect,
    }
    return data, meta, aux
