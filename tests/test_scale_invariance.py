"""Scene-scale robustness (VERDICT r1 weak #4): geometric epsilons are
relative to SceneMeta.scene_scale, so the same scene uniformly scaled by
0.01x or 100x must render the same image (the reference gets this via
triangle-id comparison, ClosestHit.slang:154-184; we use scale-relative
distance margins that fit batched any-hit queries)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box
from vpt_tpu.scene.types import Scene
from vpt_tpu.core.camera import look_at


def _scale_tf(t, k):
    t = np.asarray(t, np.float32).copy()
    t[:3, :3] *= k
    t[:3, 3] *= k
    return t


def _scaled_cornell(k: float) -> Scene:
    s = cornell_box()
    view = look_at((0.0, 0.0, 3.9 * k), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    return Scene(
        meshes=s.meshes,
        instances=[
            type(i)(mesh=i.mesh, material=i.material,
                    transform=_scale_tf(i.transform, k), name=i.name)
            for i in s.instances
        ],
        materials=s.materials, textures=s.textures,
        camera_view=view, camera_fov_deg=s.camera_fov_deg,
        camera_aspect=s.camera_aspect, name=f"cornell_x{k}",
    )


def _render(scene, size=48, spp=8, seed=3):
    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import perspective
    from vpt_tpu.render.params import default_params
    from vpt_tpu.scene.build import compile_scene

    data, meta, aux = compile_scene(scene, lookup_tables=None)
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(aux["camera_view"]), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=5, max_medium_events=0, enable_sky_mis=False,
                        use_energy_compensation=False)
    accum = jnp.zeros((size, size, 3), jnp.float32)
    img, _ = _render_step(
        data, meta, flags, params, jnp.uint32(seed), (size, size), accum,
        jnp.int32(0), spp,
    )
    return np.asarray(img), float(meta.scene_scale)


@pytest.mark.slow
def test_render_invariant_under_uniform_scaling():
    base, sc1 = _render(_scaled_cornell(1.0))
    small, sc_s = _render(_scaled_cornell(0.01))
    big, sc_b = _render(_scaled_cornell(100.0))
    assert 0.9 < sc1 < 1.1
    assert 0.009 < sc_s < 0.011 and 90 < sc_b < 110
    # Same frame seed -> same RNG streams -> images should match to float
    # noise.  Allow a small mismatch budget for rays whose epsilon-margin
    # classification flips at the new float magnitudes.
    for other, tag in ((small, "0.01x"), (big, "100x")):
        diff = np.abs(other - base)
        rel = diff.mean() / max(base.mean(), 1e-9)
        assert rel < 0.02, f"{tag}: mean abs diff {rel:.3%} of mean brightness"
        frac_off = (diff.max(-1) > 0.05 * max(base.mean(), 1e-9)).mean()
        assert frac_off < 0.05, f"{tag}: {frac_off:.1%} pixels differ materially"
