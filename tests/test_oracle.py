"""Estimator validation against the independent CPU oracle (tests/oracle.py).

SURVEY §4's "golden tests vs small CPU reference integrator": the wavefront
integrator and the NumPy oracle share no code, so agreement here validates
the estimator itself (NEE+MIS weights, emissive-hit pdf, clamps, RR), not
just reproducibility.  Matches /root/reference/PathTracer/Shaders/RayGen.slang
semantics on both sides.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracle import render_oracle, FlatScene, _intersect
from vpt_tpu.io.metrics import ssim
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box, furnace_sphere


def _conv2(img, k):
    """Tiny 'same' 2D convolution (edge-padded)."""
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    p = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.zeros_like(img)
    for i in range(kh):
        for j in range(kw):
            out += k[i, j] * p[i : i + img.shape[0], j : j + img.shape[1]]
    return out


def _render_wavefront(scene, size, spp, flags, seeds=(1, 2, 3, 4)):
    """Average several wavefront frames (different seeds) at `spp` each."""
    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import perspective
    from vpt_tpu.render.params import default_params
    from vpt_tpu.scene.build import compile_scene

    data, meta, aux = compile_scene(scene, lookup_tables=None)
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(
        np.linalg.inv(aux["camera_view"]), np.linalg.inv(proj)
    )
    imgs = []
    for sd in seeds:
        accum = jnp.zeros((size, size, 3), jnp.float32)
        img, _ = _render_step(
            data, meta, flags, params, jnp.uint32(sd), (size, size), accum,
            jnp.int32(0), spp,
        )
        imgs.append(np.asarray(img))
    return np.mean(imgs, axis=0)


def test_oracle_intersector_matches_cluster():
    """The oracle's own brute-force intersector agrees with the framework's
    trace on random rays (sanity for everything below)."""
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.render.integrator import trace

    scene = cornell_box()
    fs = FlatScene(scene)
    data, meta, _ = compile_scene(scene)
    rng = np.random.default_rng(0)
    org = rng.uniform(-0.9, 0.9, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_o, tri_o, _, _ = _intersect(fs, org.astype(np.float64), d.astype(np.float64))
    hit = trace(data, meta, jnp.asarray(org), jnp.asarray(d), jnp.ones(256, bool))
    np.testing.assert_allclose(np.asarray(hit.t), t_o, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_oracle_vs_wavefront_cornell():
    """Cornell box: SSIM > 0.99 between the two independent estimators."""
    size, spp = 48, 24
    flags = RenderFlags(
        max_depth=6, max_medium_events=0, enable_sky_mis=False,
        use_energy_compensation=False,
    )
    wf = _render_wavefront(cornell_box(), size, spp, flags, seeds=(1, 2, 3, 4))
    oc = np.stack([
        render_oracle(cornell_box(), size, size, 2 * spp, max_depth=6, frame_seed=s)
        for s in (11, 12)
    ]).mean(0)

    # Tone-compress and lightly box-filter before SSIM — the identical
    # transform on both sides removes the uncorrelated per-pixel MC noise
    # floor (σ≈6% at this spp) so SSIM measures structure, not noise.
    def prep(img):
        g = np.clip(img, 0, None) ** (1 / 2.2)
        k = np.ones((3, 3)) / 9.0
        out = np.stack(
            [_conv2(g[..., c], k) for c in range(3)], axis=-1
        )
        return out

    a = prep(np.asarray(wf))
    b = prep(oc)
    s = ssim(a, b, data_range=max(float(a.max()), float(b.max())))
    mean_rel = abs(a.mean() - b.mean()) / b.mean()
    assert mean_rel < 0.02, f"mean brightness differs {mean_rel:.3%}"
    assert s > 0.99, f"SSIM {s:.4f} <= 0.99"


@pytest.mark.slow
def test_oracle_furnace():
    """Furnace gate through the oracle: a white sphere under a unit sky
    vanishes for BOTH estimators (RayGen furnace-mode semantics)."""
    size, spp = 24, 48
    flags = RenderFlags(
        max_depth=24, max_medium_events=0, enable_sky_mis=False,
        enable_mesh_mis=False, furnace_test_mode=True,
        use_energy_compensation=False,
    )
    wf = _render_wavefront(furnace_sphere(), size, spp, flags, seeds=(1, 2))
    oc = np.stack([
        render_oracle(
            furnace_sphere(), size, size, spp, max_depth=24, frame_seed=s,
            furnace_test_mode=True,
        )
        for s in (21, 22)
    ]).mean(0)
    # Both should be ~1 everywhere; the GGX single-scatter energy loss at
    # roughness 1 makes the sphere slightly darker than 1 identically in both.
    assert abs(float(oc.mean()) - 1.0) < 0.03, f"oracle furnace {oc.mean():.4f}"
    assert abs(float(wf.mean()) - float(oc.mean())) < 0.015, (
        f"wavefront {wf.mean():.4f} vs oracle {oc.mean():.4f}"
    )
