import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.render import atmosphere as atmo
from vpt_tpu.render.params import default_params


def _states(n, seed=5):
    return rng.seed(jnp.arange(n, dtype=jnp.uint32), 0, seed)


def _surface_origin(params, n):
    # A point 10m above the planet surface at the "top" of the planet
    pos = np.asarray(params.planet_position)
    org = np.tile(pos + np.array([0, -float(params.planet_radius) - 10.0, 0.0]), (n, 1))
    return jnp.asarray(org, jnp.float32)


def test_transmittance_matches_numeric_integral():
    """Ratio-tracked transmittance is unbiased: mean over many rays must
    match exp(-integral of extinction) along an up-ray."""
    params = default_params()
    n = 20_000
    org = _surface_origin(params, n)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))  # up
    state = _states(n)
    for channel in (0, 2):
        ch = jnp.full(n, channel, jnp.int32)
        state, tr = atmo.transmittance(state, params, org, d, ch, jnp.ones(n, bool))
        got = float(np.asarray(tr).mean())

        # numeric reference
        hs = np.linspace(10.0, float(params.atmosphere_height), 20000)
        cr = float(atmo.C_RAYLEIGH[channel])
        cm = float(atmo.C_MIE[channel])
        co = float(atmo.C_OZONE[channel])
        sigma = (
            np.exp(-hs / float(params.rayleigh_density_falloff)) * cr
            + np.exp(-hs / float(params.mie_density_falloff)) * cm
            + np.exp(-np.abs(hs - float(params.ozone_peak)) / float(params.ozone_density_falloff)) * co
        )
        want = np.exp(-np.trapezoid(sigma, hs))
        assert abs(got - want) < 0.02, f"channel {channel}: {got} vs {want}"


def test_transmittance_blocked_by_planet():
    params = default_params()
    n = 64
    org = _surface_origin(params, n)
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))  # down
    state = _states(n)
    state, tr = atmo.transmittance(state, params, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    assert np.allclose(np.asarray(tr), 0.0)


def test_scatter_distance_component_stats():
    """Blue channel scatters much more than red (Rayleigh); components split
    between Rayleigh and Mie near the surface."""
    params = default_params()
    n = 50_000
    org = _surface_origin(params, n)
    d = jnp.tile(jnp.asarray([[0.0, -0.7071, 0.7071]], jnp.float32), (n, 1))
    state = _states(n, 11)
    state, t_red, comp_r = atmo.sample_scatter_distance(state, params, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    state, t_blue, comp_b = atmo.sample_scatter_distance(state, params, org, d, jnp.full(n, 2, jnp.int32), jnp.ones(n, bool))
    red_frac = float((np.asarray(t_red) >= 0).mean())
    blue_frac = float((np.asarray(t_blue) >= 0).mean())
    assert blue_frac > red_frac + 0.1
    comps = np.asarray(comp_b)[np.asarray(t_blue) >= 0]
    assert (comps == atmo.COMPONENT_RAYLEIGH).mean() > 0.5


@pytest.mark.slow
def test_atmosphere_render_blue_sky():
    """Path-traced sky: upward-looking pixels should be blue-dominant."""
    import dataclasses

    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags
    from vpt_tpu.scene.procedural import make_quad
    from vpt_tpu.scene.types import Instance, Material, Scene
    from vpt_tpu.core.camera import look_at

    # A small ground patch on the planet surface; camera looking at the horizon
    ground = make_quad((-50, -0.2, 50), (50, -0.2, 50), (50, -0.2, -50), (-50, -0.2, -50))
    view = look_at((0.0, 1.0, 0.0), (0.0, 6.0, -20.0), (0.0, 1.0, 0.0))
    scene = Scene(
        meshes=[ground],
        instances=[Instance(mesh=0, material=0, transform=np.eye(4, dtype=np.float32))],
        materials=[Material(base_color=(0.4, 0.35, 0.3))],
        textures=[],
        camera_view=view,
        camera_aspect=1.0,
        name="atmo",
    )
    r = Renderer(
        scene, width=24, height=24,
        flags=RenderFlags(max_depth=5, max_medium_events=2, enable_atmosphere=True,
                          enable_mesh_mis=False),
        samples_per_frame=8, max_samples=32, lookup_tables=None,
    )
    # Sun high in the sky
    r.set_sky_altitude(-50.0)
    img = r.render()
    assert np.isfinite(img).all()
    top = img[:8]  # sky region
    assert top.mean() > 1e-5, "sky should not be black"
    assert top[..., 2].mean() > top[..., 0].mean(), "Rayleigh sky should be blue-dominant"
