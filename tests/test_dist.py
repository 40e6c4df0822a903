import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpt_tpu.core.camera import perspective
from vpt_tpu.dist.mesh import make_mesh, render_sharded
from vpt_tpu.render.params import RenderFlags, default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def cornell_setup():
    scene = cornell_box(with_boxes=False)
    data, meta, aux = compile_scene(scene)
    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=4, max_medium_events=2)
    return data, meta, flags, params


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.slow
def test_sharded_render_finite(cornell_setup, shape):
    data, meta, flags, params = cornell_setup
    mesh = make_mesh(tile=shape[0], spp=shape[1])
    img, segs = render_sharded(
        data, meta, flags, params, (16, 16), 42, n_samples=shape[1] * 2, mesh=mesh
    )
    img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert float(segs) > 0


@pytest.mark.slow
def test_sharded_matches_single_chip_statistically(cornell_setup):
    """Mean image brightness should agree between mesh shapes (same estimator)."""
    data, meta, flags, params = cornell_setup
    img_a, _ = render_sharded(
        data, meta, flags, params, (16, 16), 7, n_samples=8,
        mesh=make_mesh(tile=8, spp=1),
    )
    img_b, _ = render_sharded(
        data, meta, flags, params, (16, 16), 7, n_samples=8,
        mesh=make_mesh(tile=2, spp=4),
    )
    a, b = float(np.asarray(img_a).mean()), float(np.asarray(img_b).mean())
    assert abs(a - b) / max(a, 1e-6) < 0.25


@pytest.mark.slow
def test_tiled_final_frame(cornell_setup):
    """High-spp band-tiled rendering (split-screen chunking analogue)."""
    from vpt_tpu.dist.mesh import render_tiled_final_frame

    data, meta, flags, params = cornell_setup
    mesh = make_mesh(tile=4, spp=2)
    img, segs = render_tiled_final_frame(
        data, meta, flags, params, (16, 16), n_samples=2, mesh=mesh, tile_rows=2
    )
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert segs > 0
