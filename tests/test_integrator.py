import numpy as np
import pytest

from vpt_tpu.api import Renderer
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box, furnace_sphere


@pytest.fixture(scope="module")
def cornell_renderer():
    scene = cornell_box()
    return Renderer(
        scene, width=64, height=64,
        flags=RenderFlags(max_depth=6, max_medium_events=2),
        samples_per_frame=4, max_samples=16, lookup_tables=None,
    )


@pytest.mark.slow
def test_cornell_renders_finite_nonzero(cornell_renderer):
    r = cornell_renderer
    r.reset_path_tracing()
    img = r.render(total_samples=8)
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.01, "scene should receive light"
    # Light source area should be the brightest region
    assert img.max() > 1.0


@pytest.mark.slow
def test_emissive_nee_exact_visibility_grazing_occluder():
    # An occluder 0.01 below the light sits INSIDE the old distance-epsilon
    # margin (t_max stopped ~1% short of the sample => the occluder was
    # never tested => light leak).  Exact triangle-id visibility
    # (ClosestHit.slang:169-176 semantics) must shadow the floor.
    from vpt_tpu.scene.procedural import make_quad
    from vpt_tpu.scene.types import Instance

    def build(with_occluder):
        scene = cornell_box(with_boxes=False)
        if with_occluder:
            s = 0.8
            y = 0.989  # 0.01 below the light plane at 0.999
            occ = make_quad((-s, y, s), (s, y, s), (s, y, -s), (-s, y, -s))
            scene.meshes.append(occ)
            scene.instances.append(Instance(
                mesh=len(scene.meshes) - 1, material=0,
                transform=np.eye(4, dtype=np.float32), name="occluder",
            ))
        r = Renderer(scene, width=48, height=48,
                     flags=RenderFlags(max_depth=4, max_medium_events=2),
                     samples_per_frame=8, max_samples=8, lookup_tables=None)
        return np.asarray(r.render(total_samples=8))

    lit = build(False)
    dark = build(True)
    # Lower half of the image (the floor region) must go nearly black —
    # with the epsilon hack it stayed at full NEE brightness.
    floor_lit = lit[30:, 8:-8].mean()
    floor_dark = dark[30:, 8:-8].mean()
    assert floor_lit > 0.05
    assert floor_dark < 0.15 * floor_lit, (
        f"light leaked through a grazing occluder: {floor_dark} vs {floor_lit}"
    )


@pytest.mark.slow
def test_cornell_color_bleeding(cornell_renderer):
    """Left wall is red, right is green: the image's left half should be
    relatively redder than the right half."""
    r = cornell_renderer
    r.reset_path_tracing()
    img = r.render(total_samples=16)
    h, w, _ = img.shape
    left = img[h // 3 : 2 * h // 3, : w // 4].mean(axis=(0, 1))
    right = img[h // 3 : 2 * h // 3, -w // 4 :].mean(axis=(0, 1))
    assert left[0] > left[1], f"left half should be red-ish, got {left}"
    assert right[1] > right[0], f"right half should be green-ish, got {right}"


@pytest.mark.slow
def test_progressive_accumulation_reduces_variance(cornell_renderer):
    r = cornell_renderer
    r.reset_path_tracing()
    r.path_trace()
    img1 = r.hdr_image()
    for _ in range(3):
        r.path_trace()
    img4 = r.hdr_image()
    # Means should agree (unbiased), and both finite
    assert np.all(np.isfinite(img1)) and np.all(np.isfinite(img4))
    assert abs(img1.mean() - img4.mean()) / max(img4.mean(), 1e-6) < 0.35


def test_setter_resets_accumulation(cornell_renderer):
    r = cornell_renderer
    r.reset_path_tracing()
    r.path_trace()
    assert r.frame_count == 1
    r.set_max_luminance(400.0)
    assert r.frame_count == 0 and r.samples_accumulated == 0


def test_checkpoint_roundtrip(tmp_path, cornell_renderer):
    r = cornell_renderer
    r.reset_path_tracing()
    r.path_trace()
    p = str(tmp_path / "ckpt.npz")
    r.save_checkpoint(p)
    img_before = r.hdr_image().copy()
    r.path_trace()
    r.load_checkpoint(p)
    np.testing.assert_array_equal(r.hdr_image(), img_before)
    assert r.frame_count == 1


@pytest.mark.slow
def test_furnace_energy_conservation():
    """Furnace test (Material.slang:78-86 + Miss.slang:61-65): a white
    diffuse sphere in a uniform unit-radiance furnace must be invisible —
    every pixel ≈ 1."""
    scene = furnace_sphere()
    r = Renderer(
        scene, width=48, height=48,
        flags=RenderFlags(
            max_depth=32, furnace_test_mode=True, enable_mesh_mis=False,
            use_energy_compensation=False, max_medium_events=2,
        ),
        samples_per_frame=8, max_samples=64, lookup_tables=None,
    )
    img = r.render(total_samples=64)
    assert np.all(np.isfinite(img))
    err = np.abs(img - 1.0)
    assert err.mean() < 0.05, f"furnace mean error {err.mean():.4f}"
    assert np.median(err) < 0.03


def test_png_export(tmp_path, cornell_renderer):
    r = cornell_renderer
    r.reset_path_tracing()
    r.path_trace()
    p = r.save(str(tmp_path / "out.png"))
    from vpt_tpu.io.image import load_png

    img = load_png(p)
    assert img.shape[0] == 64 and np.isfinite(img).all()
