import numpy as np
import pytest

from vpt_tpu.api import Renderer
from vpt_tpu.core.camera import FlyCamera, look_at, perspective
from vpt_tpu.render.integrator import accumulate_ewma
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box
from vpt_tpu.scene.types import Material


@pytest.fixture(scope="module")
def renderer():
    return Renderer(
        cornell_box(), width=32, height=32,
        flags=RenderFlags(max_depth=3, max_medium_events=2),
        samples_per_frame=2, max_samples=4, lookup_tables=None,
    )


def test_fly_camera_roundtrip():
    cam = FlyCamera(position=np.array([1.0, 2.0, 3.0], np.float32), yaw=-120.0, pitch=15.0,
                    fov_deg=50.0, aspect=1.5)
    view = cam.view_matrix()
    proj = cam.proj_matrix()
    cam2 = FlyCamera.from_matrices(view, proj)
    np.testing.assert_allclose(cam2.position, cam.position, atol=1e-4)
    assert abs((cam2.yaw - cam.yaw + 180) % 360 - 180) < 0.1
    assert abs(cam2.pitch - cam.pitch) < 0.1
    assert abs(cam2.fov_deg - cam.fov_deg) < 0.1
    assert abs(cam2.aspect - cam.aspect) < 1e-3


def test_fly_camera_movement():
    cam = FlyCamera()
    p0 = cam.position.copy()
    cam.move("forward", 2.0)
    assert np.linalg.norm(cam.position - p0) == pytest.approx(2.0, abs=1e-5)
    cam.rotate(90.0, 0.0)
    cam.move("forward", 1.0)
    assert not np.allclose(cam.front, [0, 0, -1], atol=0.1)
    cam.rotate(0.0, 200.0)  # pitch clamps at 89
    assert cam.pitch == 89.0


def test_ewma_accumulation_equals_mean():
    rng = np.random.default_rng(0)
    frames = [rng.random((4, 4, 3)).astype(np.float32) for _ in range(5)]
    acc = frames[0]
    for i, f in enumerate(frames[1:], start=1):
        acc = np.asarray(accumulate_ewma(acc, f, i))
    np.testing.assert_allclose(acc, np.mean(frames, axis=0), rtol=1e-5)


def test_setters_and_state(renderer):
    r = renderer
    r.reset_path_tracing()
    r.set_sky_azimuth(45.0)
    assert float(r.params.sky_rotation_azimuth) == 45.0
    r.set_sky_intensity(2.0)
    assert float(r.params.environment_intensity) == 2.0
    r.set_max_depth(5)
    assert r.flags.max_depth == 5
    r.set_phase_function("draine")
    assert r.flags.phase_function == "draine"
    r.set_mesh_mis(False)
    assert not r.flags.enable_mesh_mis
    r.set_mesh_mis(True)
    r.set_max_depth(3)
    r.set_phase_function("hg")


def test_set_material_updates_table(renderer):
    r = renderer
    old = r.get_material(1)
    r.set_material(1, Material(name="blue", base_color=(0.1, 0.1, 0.9)))
    np.testing.assert_allclose(
        np.asarray(r.scene_data.materials.base_color[1]), [0.1, 0.1, 0.9], atol=1e-6
    )
    assert r.frame_count == 0
    r.set_material(1, old)


@pytest.mark.slow
def test_resize_and_render(renderer):
    r = renderer
    r.resize_image(16, 24)
    img = r.render(total_samples=2)
    assert img.shape == (24, 16, 3)
    r.resize_image(32, 32)
    r.set_max_samples(4)


def test_sync_fly_camera(renderer):
    r = renderer
    r.camera.move("left", 0.5)
    r.sync_fly_camera()
    assert r.frame_count == 0  # reset triggered


@pytest.mark.slow
def test_export_filename_embeds_stats(tmp_path, renderer):
    r = renderer
    r.reset_path_tracing()
    r.render(total_samples=2)
    p = r.save(str(tmp_path / "img"), embed_stats=True)
    assert "spp" in p and p.endswith(".png")


def test_bench_derived_detail_finite():
    """bench.py's hardware-terms fields are pure derivations; assert they
    stay finite and positive on representative inputs (VERDICT r4 #6)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    hw = bench.derived_hardware_detail(
        median_rate=1.0e6, median_dt=4.2, segs_per_dispatch=4.4e6, spp_per_dispatch=4
    )
    for k in ("time_to_1024spp_s", "cycles_per_segment", "mt_utilization_pct"):
        assert np.isfinite(hw[k]) and hw[k] > 0, (k, hw[k])
    assert hw["time_to_1024spp_s"] == 256 * 4.2
