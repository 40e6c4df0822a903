"""Energy-compensation lookup bake tests (LookupReflect/Refract.slang +
Turquin 2019 semantics)."""

import numpy as np
import pytest

from vpt_tpu.render.lookup import bake_reflection_table, bake_refraction_table


@pytest.fixture(scope="module")
def reflect_table():
    return bake_reflection_table(n_samples=512)


@pytest.mark.slow
def test_reflection_albedo_properties(reflect_table):
    t = reflect_table  # (32 aniso, 64 roughness, 64 v.z)
    assert t.shape == (32, 64, 64)
    assert np.isfinite(t).all()
    assert (t >= 0).all() and (t <= 1.2).all()
    # Smooth surfaces reflect ~all energy (E ~ 1 at low roughness)
    assert t[0, 1, 32:].mean() > 0.95
    # Rough surfaces at grazing angles lose energy to multi-scatter (E < 1)
    assert t[0, -1, 8] < 0.9
    # Energy loss increases with roughness at fixed view angle
    col = t[0, :, 40]
    assert col[-1] < col[2]


@pytest.mark.slow
def test_refraction_table_properties():
    t = bake_refraction_table(above_surface=True, n_samples=256)
    assert t.shape == (32, 128, 128)
    assert np.isfinite(t).all()
    # Smooth glass transmits+reflects ~all energy
    assert t[8, 2, 64:].mean() > 0.9


@pytest.mark.slow
def test_furnace_energy_compensation_improves_rough_metal():
    """A rough metal in a furnace loses multi-scatter energy without
    compensation; the lookup tables must recover most of it
    (Material.slang:291-308 / Turquin 2019)."""
    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags
    from vpt_tpu.scene.procedural import furnace_sphere

    scene = furnace_sphere()
    scene.materials[0].metallic = 1.0
    scene.materials[0].roughness = 0.9

    def run(use_comp, tables):
        r = Renderer(
            scene, width=32, height=32,
            flags=RenderFlags(max_depth=16, furnace_test_mode=True,
                              enable_mesh_mis=False, use_energy_compensation=use_comp,
                              max_medium_events=2),
            samples_per_frame=8, max_samples=48, lookup_tables=tables,
        )
        img = r.render()
        # Interior pixels only (sphere covers the center)
        return float(img[12:20, 12:20].mean())

    reflect = bake_reflection_table(n_samples=512)
    ones = np.ones((32, 128, 128), np.float32)
    without = run(False, None)
    with_comp = run(True, (reflect, ones, ones))
    assert without < 0.97, f"uncompensated rough metal should lose energy, got {without}"
    assert abs(with_comp - 1.0) < abs(without - 1.0), (
        f"compensation should move the furnace toward 1: {without} -> {with_comp}"
    )
    assert with_comp > 0.93
