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


def _have_reference_tables():
    import os

    from vpt_tpu.render.lookup import REFERENCE_TABLE_DIR

    return os.path.isdir(REFERENCE_TABLE_DIR)


@pytest.mark.skipif(not _have_reference_tables(), reason="reference tables absent")
def test_reference_tables_load():
    """The reference's committed .bin tables (10M samples/texel ground truth,
    PathTracer.cpp:199-201, 871-937) load into our table shapes with sane
    albedo ranges."""
    from vpt_tpu.render.lookup import load_reference_tables

    reflect, refract_out, refract_in = load_reference_tables()
    assert reflect.shape == (32, 64, 64)
    assert refract_out.shape == (32, 128, 128)
    assert refract_in.shape == (32, 128, 128)
    for t in (reflect, refract_out, refract_in):
        assert np.isfinite(t).all()
        assert (t > 0).all() and (t <= 1.0 + 1e-5).all()
    # Smooth-surface rows reflect ~all energy in every table
    assert reflect[0, 1, 32:].mean() > 0.97


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference_tables(), reason="reference tables absent")
def test_bake_matches_reference_reflection(reflect_table):
    """Our JAX bake agrees with the reference's 10M-sample ground truth to
    MC-noise level (512 samples/texel -> rms ~1e-2).  Same texel grid: both
    use viewCos=x/Nx clamp(0.05,0.999) etc. (LookupReflect.slang:37-42)."""
    from vpt_tpu.render.lookup import load_reference_tables

    ref = load_reference_tables()[0]
    err = reflect_table - ref
    rms = float(np.sqrt(np.mean(err**2)))
    assert rms < 0.02, f"reflection bake rms vs reference ground truth: {rms}"
    assert float(np.abs(err).max()) < 0.15


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference_tables(), reason="reference tables absent")
def test_bake_matches_reference_refraction():
    """Refraction bakes vs the committed RefractionLookupHitFrom{Outside,
    Inside}.bin (LookupRefract.slang grid)."""
    from vpt_tpu.render.lookup import bake_refraction_table, load_reference_tables

    _, ref_out, ref_in = load_reference_tables()
    for above, ref in ((True, ref_out), (False, ref_in)):
        ours = bake_refraction_table(above_surface=above, n_samples=512)
        rms = float(np.sqrt(np.mean((ours - ref) ** 2)))
        assert rms < 0.03, f"refraction(above={above}) rms vs reference: {rms}"


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
