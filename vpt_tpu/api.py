"""`Renderer` — the public API, mirroring the reference's PathTracer host
object (PathTracer.h:83-183): progressive accumulation, ~40 typed setters
that each restart accumulation, post-processing, and image export.  The
ImGui editor's *capabilities* (runtime parameter setting, accumulation
restart, PNG export, scene switching) are exposed as methods / the CLI.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.core.camera import FlyCamera, look_at, perspective
from vpt_tpu.post.bloom import bloom as bloom_pass
from vpt_tpu.post.tonemap import tonemap as tonemap_pass
from vpt_tpu.render import integrator
from vpt_tpu.render.params import RenderFlags, RenderParams, default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene.types import Material, Scene
from vpt_tpu.io.image import export_filename, save_hdr, save_png


@dataclasses.dataclass
class PostSettings:
    """PostProcessor knobs (PostProcessor.h:36-50 defaults)."""

    exposure: float = 1.0
    gamma: float = 2.2
    bloom_threshold: float = 1.5
    bloom_strength: float = 0.5
    bloom_falloff: float = 0.5
    bloom_mip_levels: int = 10
    tonemap_mode: str = "aces"
    enable_bloom: bool = False


def _render_step_impl(
    scene_data, meta, flags, params, frame_seed, resolution, accum, frame_count,
    n_samples, pixel_xy=None, pixel_index=None, scatter=None,
):
    """One progressive dispatch: n_samples new paths/pixel, EWMA'd into accum.

    Rays are laid out in 8x8 screen tiles (vpt_tpu.core.tiling) so the
    intersector's 64-ray packets are coherent; `scatter` maps them back to
    row-major pixels.
    """
    from vpt_tpu.core.tiling import scatter_to_image, tiled_pixel_order

    width, height = resolution
    if pixel_xy is None:
        pxy, pidx, sct, padded = tiled_pixel_order(width, height)
        pixel_xy = jnp.asarray(pxy)
        pixel_index = jnp.asarray(pidx)
        scatter = jnp.asarray(sct)
    else:
        padded = (-(-width // 8) * 8, -(-height // 8) * 8)
    radiance, segments = integrator.render_samples(
        scene_data, meta, flags, params, pixel_xy, pixel_index, resolution, frame_seed, n_samples
    )
    new = scatter_to_image(radiance, scatter, padded, width, height)
    out = integrator.accumulate_ewma(accum, new, frame_count)
    return out, segments


# Scene-closure jit cache.  The scene pytree must reach XLA as a CLOSURE
# CONSTANT, not a traced argument: the TPU compiler stages large
# loop-invariant *arguments* of the path-tracing while_loop through
# per-iteration copies (measured 2026-08-20: the identical 4-iteration
# trace loop runs 0.24 s with the scene closed over vs 10.7 s passed as an
# argument — scripts/loopshape_check.py vs scripts/whileloop_check.py).
# Keyed by the identity of the scene's leaves plus every static knob;
# entries hold strong references so ids cannot be recycled while cached.
_STEP_CACHE: "dict" = {}
_STEP_CACHE_CAP = 8


def _render_step(
    scene_data, meta, flags, params, frame_seed, resolution, accum, frame_count,
    n_samples, pixel_xy=None, pixel_index=None, scatter=None,
):
    leaves = jax.tree.leaves(scene_data)
    key = (
        tuple(id(x) for x in leaves), meta, flags, resolution, int(n_samples),
        None if pixel_xy is None else (id(pixel_xy), id(pixel_index), id(scatter)),
    )
    hit = _STEP_CACHE.get(key)
    if hit is None:
        if len(_STEP_CACHE) >= _STEP_CACHE_CAP:
            _STEP_CACHE.pop(next(iter(_STEP_CACHE)))
        data_c = scene_data
        pxy_c, pidx_c, sct_c = pixel_xy, pixel_index, scatter

        @jax.jit
        def step(params, frame_seed, accum, frame_count):
            return _render_step_impl(
                data_c, meta, flags, params, frame_seed, resolution, accum,
                frame_count, n_samples, pxy_c, pidx_c, sct_c,
            )

        # Strong refs keep the id() key valid for the cache's lifetime.
        hit = (step, scene_data, (pixel_xy, pixel_index, scatter))
        _STEP_CACHE[key] = hit
    return hit[0](params, frame_seed, accum, frame_count)


class Renderer:
    """Progressive TPU path tracer over a compiled scene."""

    def __init__(
        self,
        scene: Scene,
        width: Optional[int] = None,
        height: Optional[int] = None,
        flags: RenderFlags = RenderFlags(),
        samples_per_frame: int = 1,
        max_samples: int = 5000,
        lookup_tables="auto",
        metrics_log=None,
    ):
        self._scene_host = scene
        if lookup_tables == "auto":
            from vpt_tpu.render.lookup import get_lookup_tables

            lookup_tables = get_lookup_tables() if flags.use_energy_compensation else None
        elif lookup_tables == "reference":
            # The reference's committed 10M-sample ground-truth tables
            # (PathTracer.cpp:199-201) instead of the JAX bake.
            from vpt_tpu.render.lookup import load_reference_tables

            lookup_tables = load_reference_tables()
        self.scene_data, self.meta, aux = compile_scene(scene, lookup_tables=lookup_tables)
        self.flags = flags
        self.post = PostSettings()

        # Output sized 1080·aspect × 1080 like the reference (PathTracer.cpp:507-512)
        aspect = aux["camera_aspect"]
        if height is None:
            height = 1080
        if width is None:
            width = int(round(height * aspect))
        self.width, self.height = width, height

        view = aux["camera_view"] if aux["camera_view"] is not None else look_at(
            (0.0, 0.0, 5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        )
        proj = perspective(np.radians(aux["camera_fov_deg"]), width / height)
        self.params = default_params(
            view_inverse=np.linalg.inv(view), proj_inverse=np.linalg.inv(proj)
        )
        self.camera = FlyCamera.from_matrices(view, proj)

        self.samples_per_frame = samples_per_frame
        self.max_samples = max_samples
        self._accum = jnp.zeros((height, width, 3), jnp.float32)
        self.frame_count = 0
        self.samples_accumulated = 0
        self._seed_counter = 0
        self.render_seconds = 0.0
        self.segments_traced = 0.0
        from vpt_tpu.io.metrics_log import RenderLog

        self.metrics = (
            RenderLog.open(metrics_log) if isinstance(metrics_log, str)
            else (metrics_log or RenderLog.null())
        )

    # ------------------------------------------------------------------ core

    def reset_path_tracing(self) -> None:
        """ResetPathTracing (PathTracer.h:183)."""
        self.frame_count = 0
        self.samples_accumulated = 0
        self.render_seconds = 0.0
        self.segments_traced = 0.0

    reset_accumulation = reset_path_tracing

    def path_trace(self) -> bool:
        """One progressive dispatch; True when max_samples reached
        (PathTracer::PathTrace, PathTracer.cpp:122-156)."""
        if self.samples_accumulated >= self.max_samples:
            return True
        t0 = time.perf_counter()
        self._seed_counter += 1
        seed = np.uint32((self._seed_counter * 2654435761) & 0xFFFFFFFF)
        self._accum, segments = _render_step(
            self.scene_data,
            self.meta,
            self.flags,
            self.params,
            jnp.uint32(seed),
            (self.width, self.height),
            self._accum if self.frame_count > 0 else jnp.zeros_like(self._accum),
            jnp.int32(self.frame_count),
            self.samples_per_frame,
        )
        self._accum.block_until_ready()
        dt = time.perf_counter() - t0
        self.segments_traced += float(segments)
        self.render_seconds += dt
        self.frame_count += 1
        self.samples_accumulated += self.samples_per_frame
        self.metrics.dispatch(
            frame=self.frame_count, seed=int(seed), spp=self.samples_per_frame,
            wall_s=dt, segments=float(segments),
            samples_accumulated=self.samples_accumulated,
            resolution=(self.width, self.height), scene=self.meta.name,
        )
        return self.samples_accumulated >= self.max_samples

    def render(self, total_samples: Optional[int] = None, verbose: bool = False):
        """Accumulate until done; returns the HDR accumulation buffer."""
        if total_samples is not None:
            self.max_samples = total_samples
        while not self.path_trace():
            if verbose and self.frame_count % 16 == 0:
                eta = self.render_seconds * (self.max_samples - self.samples_accumulated) / max(
                    self.samples_accumulated, 1
                )
                print(
                    f"[vpt] {self.samples_accumulated}/{self.max_samples} spp, "
                    f"{self.render_seconds:.1f}s elapsed, ETA {eta:.1f}s"
                )
        return self.hdr_image()

    # ---------------------------------------------------------------- output

    def hdr_image(self) -> np.ndarray:
        return np.asarray(self._accum)

    def output_image(self) -> np.ndarray:
        """Post-processed LDR image (PostProcessor::PostProcess equivalent)."""
        img = self._accum
        bl = None
        if self.post.enable_bloom:
            bl = bloom_pass(
                img,
                threshold=self.post.bloom_threshold,
                strength=self.post.bloom_strength,
                falloff_range=self.post.bloom_falloff,
                mip_levels=self.post.bloom_mip_levels,
            )
        out = tonemap_pass(
            img, bloom=bl, exposure=self.post.exposure, gamma=self.post.gamma,
            mode=self.post.tonemap_mode,
        )
        return np.asarray(out)

    def save(self, path: str, embed_stats: bool = False) -> str:
        if embed_stats:
            base = path[:-4] if path.endswith(".png") else path
            path = export_filename(base, self.samples_accumulated, self.render_seconds)
        if path.endswith(".npy"):
            save_hdr(path, self.hdr_image())
        else:
            save_png(path, self.output_image())
        return path

    # ------------------------------------------------------------ checkpoint

    def save_checkpoint(self, path: str) -> None:
        """Accumulation buffer + counters — the full resumable state
        (SURVEY §5 checkpoint/resume)."""
        np.savez(
            path,
            accum=np.asarray(self._accum),
            frame_count=self.frame_count,
            samples_accumulated=self.samples_accumulated,
            seed_counter=self._seed_counter,
            render_seconds=self.render_seconds,
        )

    def load_checkpoint(self, path: str) -> None:
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        self._accum = jnp.asarray(d["accum"])
        self.frame_count = int(d["frame_count"])
        self.samples_accumulated = int(d["samples_accumulated"])
        self._seed_counter = int(d["seed_counter"])
        self.render_seconds = float(d["render_seconds"])

    # --------------------------------------------------------------- setters
    # Every setter resets accumulation, like the reference's Set* methods.

    def _param(self, **kw) -> None:
        self.params = self.params._replace(
            **{k: jnp.asarray(v, jnp.float32) for k, v in kw.items()}
        )
        self.reset_path_tracing()

    def _flag(self, **kw) -> None:
        self.flags = dataclasses.replace(self.flags, **kw)
        self.reset_path_tracing()

    def set_camera(self, view=None, proj=None) -> None:
        kw = {}
        if view is not None:
            kw["view_inverse"] = np.linalg.inv(np.asarray(view, np.float32))
        if proj is not None:
            kw["proj_inverse"] = np.linalg.inv(np.asarray(proj, np.float32))
        self._param(**kw)

    def sync_fly_camera(self) -> None:
        self.set_camera(view=self.camera.view_matrix(), proj=self.camera.proj_matrix())

    def set_max_depth(self, d: int) -> None:
        self._flag(max_depth=int(d))

    def set_max_samples(self, s: int) -> None:
        self.max_samples = int(s)

    def set_samples_per_frame(self, s: int) -> None:
        self.samples_per_frame = int(s)
        self.reset_path_tracing()

    def set_max_luminance(self, v: float) -> None:
        self._param(max_luminance=v)

    def set_focus_distance(self, v: float) -> None:
        self._param(focus_distance=v)

    def set_dof_strength(self, v: float) -> None:
        self._param(dof_strength=v)

    def set_sky_azimuth(self, deg: float) -> None:
        self._param(sky_rotation_azimuth=deg)

    def set_sky_altitude(self, deg: float) -> None:
        self._param(sky_rotation_altitude=deg)

    def set_sky_intensity(self, v: float) -> None:
        self._param(environment_intensity=v)

    def set_emissive_pdf_bias(self, v: float) -> None:
        self._param(emissive_pdf_bias=v)

    def set_sun_color(self, rgb) -> None:
        self._param(sun_color=jnp.asarray(rgb, jnp.float32))

    def set_sky_mis(self, on: bool) -> None:
        self._flag(enable_sky_mis=bool(on))

    def set_mesh_mis(self, on: bool) -> None:
        self._flag(enable_mesh_mis=bool(on))

    def set_env_map_shown_directly(self, on: bool) -> None:
        self._flag(show_env_map_directly=bool(on))

    def set_use_only_geometry_normals(self, on: bool) -> None:
        self._flag(use_only_geometry_normals=bool(on))

    def set_use_energy_compensation(self, on: bool) -> None:
        self._flag(use_energy_compensation=bool(on))

    def set_furnace_test_mode(self, on: bool) -> None:
        self._flag(furnace_test_mode=bool(on))

    def set_enable_atmosphere(self, on: bool) -> None:
        self._flag(enable_atmosphere=bool(on))

    def set_phase_function(self, name: str) -> None:
        assert name in ("hg", "draine", "hg_draine")
        self._flag(phase_function=name)

    # Atmosphere parameter setters (PathTracer.h:168-179)
    def set_planet_position(self, pos) -> None:
        self._param(planet_position=jnp.asarray(pos, jnp.float32))

    def set_planet_radius(self, r: float) -> None:
        self._param(planet_radius=r)

    def set_atmosphere_height(self, h: float) -> None:
        self._param(atmosphere_height=h)

    def set_rayleigh_scattering_multiplier(self, m) -> None:
        self._param(rayleigh_scattering_multiplier=jnp.asarray(m, jnp.float32))

    def set_mie_scattering_multiplier(self, m) -> None:
        self._param(mie_scattering_multiplier=jnp.asarray(m, jnp.float32))

    def set_ozone_absorption_multiplier(self, m) -> None:
        self._param(ozone_absorption_multiplier=jnp.asarray(m, jnp.float32))

    def set_rayleigh_density_falloff(self, v: float) -> None:
        self._param(rayleigh_density_falloff=v)

    def set_mie_density_falloff(self, v: float) -> None:
        self._param(mie_density_falloff=v)

    def set_ozone_density_falloff(self, v: float) -> None:
        self._param(ozone_density_falloff=v)

    def set_ozone_peak(self, v: float) -> None:
        self._param(ozone_peak=v)

    def set_env_map(self, env) -> None:
        """SetEnvMapFilepath (PathTracer.cpp:1137-1332): path to an HDR or an
        (H, W, 3) array; rebuilds the alias map and resets accumulation."""
        from vpt_tpu.scene.envmap import load_hdr, prepare_environment
        from vpt_tpu.scene.types import EnvMapData

        if isinstance(env, str):
            env = load_hdr(env)
        data = prepare_environment(np.asarray(env, np.float32))
        self._scene_host.env_map = np.asarray(env, np.float32)
        self.scene_data = self.scene_data._replace(
            env=EnvMapData(*(jnp.asarray(x) for x in data))
        )
        self.reset_path_tracing()

    @property
    def total_vertex_count(self) -> int:
        return int(sum(m.positions.shape[0] for m in self._scene_host.meshes))

    @property
    def total_index_count(self) -> int:
        return int(sum(m.indices.shape[0] for m in self._scene_host.meshes))

    def set_material(self, index: int, material: Material) -> None:
        """SetMaterial (PathTracer.cpp:1010-…): update one material in place."""
        self._scene_host.materials[index] = material
        from vpt_tpu.scene.build import build_material_table

        self.scene_data = self.scene_data._replace(
            materials=build_material_table(self._scene_host.materials)
        )
        self.reset_path_tracing()

    def get_material(self, index: int) -> Material:
        return self._scene_host.materials[index]

    @property
    def materials(self):
        return self._scene_host.materials

    def resize_image(self, width: int, height: int) -> None:
        self.width, self.height = width, height
        self._accum = jnp.zeros((height, width, 3), jnp.float32)
        # Rebuild the projection for the new aspect ratio (the reference
        # recreates its output image + UBO matrices on resize,
        # PathTracer.cpp ResizeImage) — otherwise the render is stretched.
        self.camera.aspect = width / height
        self.set_camera(proj=self.camera.proj_matrix())

    # --------------------------------------------------------------- volumes
    # AddVolume / SetVolume / RemoveVolume (PathTracer.cpp:1334-…)

    def _rebuild_volumes(self) -> None:
        from vpt_tpu.scene.build import build_volume_table

        self.scene_data = self.scene_data._replace(
            volumes=build_volume_table(self._volumes)
        )
        n_het = sum(1 for v in self._volumes if v.density_grid is not None)
        self.meta = dataclasses.replace(
            self.meta, n_volumes=len(self._volumes), n_het_volumes=n_het
        )
        self.reset_path_tracing()

    @property
    def volumes(self):
        if not hasattr(self, "_volumes"):
            self._volumes = []
        return self._volumes

    def add_volume(self, volume) -> None:
        self.volumes.append(volume)
        self._rebuild_volumes()

    def set_volume(self, index: int, volume) -> None:
        self.volumes[index] = volume
        self._rebuild_volumes()

    def remove_volume(self, index: int) -> None:
        self.volumes.pop(index)
        self._rebuild_volumes()

    def add_density_data_to_volume(self, index: int, grid, temperature=None) -> None:
        """AddDensityDataToVolume (PathTracer.cpp:1347-1516): attach a dense
        density grid (or a path to .npy/.npz/.vdb via vpt_tpu.scene.vdb)."""
        if isinstance(grid, str):
            from vpt_tpu.scene.vdb import load_grid

            grid = load_grid(grid)
        self.volumes[index].density_grid = grid
        if temperature is not None:
            if isinstance(temperature, str):
                from vpt_tpu.scene.vdb import load_grid

                temperature = load_grid(temperature)
            self.volumes[index].temperature_grid = temperature
        self._rebuild_volumes()

    def remove_density_data_from_volume(self, index: int) -> None:
        self.volumes[index].density_grid = None
        self.volumes[index].temperature_grid = None
        self._rebuild_volumes()
