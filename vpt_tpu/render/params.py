"""Render parameters.

Mirrors the reference's 3-tier config (SURVEY §5):

* `RenderFlags` — compile-time shader `#define`s (PathTracer.cpp:621-656).
  Frozen/hashable; passed as a jit static argument, so toggling one retraces
  (the analogue of the reference's full pipeline rebuild in ReloadShaders).
* `RenderParams` — the UBO (Bindings.slang:21-52).  A pytree of scalars;
  changing values does NOT retrace.  Every setter on the API resets
  accumulation, like the reference's Set* -> ResetPathTracing().
* Push-constant equivalents {frame, seed} are plain arguments to the step
  function.

Defaults match PathTracer.h:197-233.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RenderFlags:
    enable_sky_mis: bool = True
    enable_mesh_mis: bool = True
    show_env_map_directly: bool = True
    use_only_geometry_normals: bool = False
    use_energy_compensation: bool = True
    furnace_test_mode: bool = False
    enable_atmosphere: bool = False
    phase_function: str = "hg"  # "hg" | "draine" | "hg_draine"
    max_depth: int = 200
    samples_per_launch: int = 1
    # Wavefront controls (no reference analogue; TPU scheduling knobs):
    max_medium_events: int = 32  # extra loop slack for in-medium walks


class RenderParams(NamedTuple):
    """Dynamic (non-retracing) parameters; the UBO equivalent."""

    view_inverse: jnp.ndarray  # (4, 4)
    proj_inverse: jnp.ndarray  # (4, 4)
    max_luminance: jnp.ndarray  # firefly clamp, default 500
    focus_distance: jnp.ndarray
    dof_strength: jnp.ndarray
    sky_rotation_azimuth: jnp.ndarray  # degrees
    sky_rotation_altitude: jnp.ndarray  # degrees
    environment_intensity: jnp.ndarray
    emissive_pdf_bias: jnp.ndarray  # EmissiveMeshSamplingPDFBias
    sun_color: jnp.ndarray  # (3,)
    # Atmosphere block (Bindings.slang:27-37); meters.
    planet_position: jnp.ndarray  # (3,)
    planet_radius: jnp.ndarray
    atmosphere_height: jnp.ndarray
    rayleigh_scattering_multiplier: jnp.ndarray  # (3,)
    mie_scattering_multiplier: jnp.ndarray  # (3,)
    ozone_absorption_multiplier: jnp.ndarray  # (3,)
    rayleigh_density_falloff: jnp.ndarray
    mie_density_falloff: jnp.ndarray
    ozone_density_falloff: jnp.ndarray
    ozone_peak: jnp.ndarray


def default_params(view_inverse=None, proj_inverse=None) -> RenderParams:
    eye = jnp.eye(4, dtype=jnp.float32)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return RenderParams(
        view_inverse=f32(view_inverse) if view_inverse is not None else eye,
        proj_inverse=f32(proj_inverse) if proj_inverse is not None else eye,
        max_luminance=f32(500.0),
        focus_distance=f32(1.0),
        dof_strength=f32(0.0),
        sky_rotation_azimuth=f32(0.0),
        sky_rotation_altitude=f32(0.0),
        environment_intensity=f32(1.0),
        emissive_pdf_bias=f32(0.0),
        sun_color=f32(jnp.array([1.0, 0.956, 0.88])),
        planet_position=f32(jnp.array([0.0, 6360e3 + 1000.0, 0.0])),
        planet_radius=f32(6360e3),
        atmosphere_height=f32(100e3),
        rayleigh_scattering_multiplier=f32(jnp.ones(3)),
        mie_scattering_multiplier=f32(jnp.ones(3)),
        ozone_absorption_multiplier=f32(jnp.ones(3)),
        rayleigh_density_falloff=f32(8000.0),
        mie_density_falloff=f32(1200.0),
        ozone_density_falloff=f32(5000.0),
        ozone_peak=f32(22000.0),
    )
