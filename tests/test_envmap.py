import numpy as np
import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import direction_to_uv
from vpt_tpu.render import lights
from vpt_tpu.scene.envmap import build_alias_map, prepare_environment
from vpt_tpu.scene.types import EnvMapData


def test_alias_map_frequencies():
    w = np.array([1.0, 2.0, 3.0, 10.0, 0.0, 4.0], np.float64)
    alias, imp = build_alias_map(w)
    # Simulate alias sampling
    n = 400_000
    r = np.random.default_rng(0)
    idx = r.integers(0, len(w), n)
    u = r.uniform(0, 1, n)
    chosen = np.where(u < imp[idx], idx, alias[idx])
    freq = np.bincount(chosen, minlength=len(w)) / n
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.005)


def test_env_pdf_alpha_convention():
    img = np.random.default_rng(1).uniform(0, 4, (16, 32, 3)).astype(np.float32)
    env = prepare_environment(img)
    # alpha = max(RGB) / sum(solid-angle-weighted max RGB) (PathTracer.cpp:1288-1296)
    step_phi = 2 * np.pi / 32
    theta = np.pi * np.arange(17) / 16
    area = (np.cos(theta[:-1]) - np.cos(theta[1:])) * step_phi
    total = (area[:, None] * img.max(-1)).sum()
    np.testing.assert_allclose(env.image[..., 3], img.max(-1) / total, rtol=1e-5)


def test_importance_sample_env_directions_match_lookup():
    """Sampled direction + stored UV must invert through DirectionToUV."""
    img = np.random.default_rng(2).uniform(0.1, 2, (32, 64, 3)).astype(np.float32)
    env0 = prepare_environment(img)
    env = EnvMapData(*(jnp.asarray(x) for x in env0))
    state = rng.seed(jnp.arange(5000, dtype=jnp.uint32), 0, 5)
    state, to_light, rgba = lights.importance_sample_env(state, env, 0.0, 0.0, (5000,))
    d = np.asarray(to_light)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # Radiance of the sampled texel should be positive and finite
    assert np.all(np.isfinite(np.asarray(rgba)))
    # Directions map back onto the sphere grid: v in [0,1]
    u, v = direction_to_uv(jnp.asarray(d))
    assert np.asarray(v).min() >= 0 and np.asarray(v).max() <= 1


def test_importance_sampling_prefers_bright_texels():
    img = np.zeros((16, 32, 3), np.float32)
    img[4, 7] = 100.0  # one very bright texel
    img += 0.01
    env0 = prepare_environment(img)
    env = EnvMapData(*(jnp.asarray(x) for x in env0))
    state = rng.seed(jnp.arange(20000, dtype=jnp.uint32), 0, 11)
    _, to_light, rgba = lights.importance_sample_env(state, env, 0.0, 0.0, (20000,))
    # Most samples should land in the bright texel.  Bilinear filtering can
    # dilute an in-texel sample down to ~25 (corner = avg of 4 texels), so
    # threshold below that.
    bright = np.asarray(rgba[:, 0]) > 20.0
    assert bright.mean() > 0.9


def test_env_radiance_rotation_roundtrip():
    img = np.random.default_rng(3).uniform(0, 1, (16, 32, 3)).astype(np.float32)
    env0 = prepare_environment(img)
    from vpt_tpu.scene.types import EnvMapData
    env = EnvMapData(*(jnp.asarray(x) for x in env0))
    d = jnp.asarray(np.array([[0.0, 0.3, -0.95]], np.float32))
    d = d / jnp.linalg.norm(d)
    base = lights.env_radiance(env, d, 0.0, 0.0)
    rot = lights.env_radiance(env, d, 360.0, 0.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(rot), atol=1e-3)
