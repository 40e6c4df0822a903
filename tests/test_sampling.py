import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.render import sampling


def _states(n, seed=3):
    return rng.seed(jnp.arange(n, dtype=jnp.uint32), 0, seed)


def test_sphere_sampling_uniform():
    _, d = sampling.sample_sphere(_states(200_000))
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.all(np.abs(d.mean(axis=0)) < 0.01)
    # Each octant gets ~1/8
    octant = (d > 0).astype(int)
    counts = np.bincount(octant[:, 0] * 4 + octant[:, 1] * 2 + octant[:, 2], minlength=8)
    assert np.all(np.abs(counts / len(d) - 0.125) < 0.01)


def test_cosine_hemisphere_moments():
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200_000, 3))
    _, d = sampling.sample_cosine_hemisphere(_states(200_000), n)
    z = np.asarray(d[:, 2])
    assert z.min() >= -1e-6
    # E[cosθ] = 2/3 for pdf = cosθ/π
    assert abs(z.mean() - 2.0 / 3.0) < 0.005


def test_ggx_vndf_halfvector_valid():
    v = jnp.broadcast_to(jnp.asarray(np.array([0.3, -0.2, 0.9]) / np.linalg.norm([0.3, -0.2, 0.9])), (50_000, 3)).astype(jnp.float32)
    _, h = sampling.sample_ggx_vndf(_states(50_000), v, 0.3, 0.5)
    h = np.asarray(h)
    assert np.all(h[:, 2] >= 0)
    np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
    # All sampled half-vectors must be visible from v
    assert np.all((h * np.asarray(v)).sum(-1) > -1e-5)


def _phase_quadrature(phase_fn, n=200_001):
    """∫ phase dΩ over the sphere via cosθ quadrature (azimuthal symmetry)."""
    mu = np.linspace(-1, 1, n)
    v = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    l = jnp.stack([jnp.sqrt(jnp.clip(1 - jnp.asarray(mu) ** 2, 0, 1)), jnp.zeros(n), jnp.asarray(mu)], axis=-1)
    vals = np.asarray(phase_fn(v, l.astype(jnp.float32)))
    return 2 * np.pi * np.trapezoid(vals, mu)


def test_phase_functions_normalized():
    assert abs(_phase_quadrature(lambda v, l: sampling.phase_rayleigh(v, l)) - 1.0) < 1e-3
    assert abs(_phase_quadrature(lambda v, l: sampling.phase_henyey_greenstein(v, l, 0.6)) - 1.0) < 1e-3
    assert abs(_phase_quadrature(lambda v, l: sampling.phase_henyey_greenstein(v, l, 0.0)) - 1.0) < 1e-3
    assert abs(_phase_quadrature(lambda v, l: sampling.phase_draine(v, l, 0.5, 1.0)) - 1.0) < 1e-3


def test_hg_plus_draine_is_weighted_mixture():
    """HG+Draine must equal w_d·HG(g_hg) + (1−w_d)·Draine(g_d, α)
    (Sampler.slang:269-284 constants); normalization follows from the parts."""
    d = 20.0
    g_hg, g_d, alpha_d, w_d = (float(np.asarray(x)) for x in sampling.hg_plus_draine_params(d))
    v = jnp.array([[0.0, 0.0, 1.0]])
    for mu in (-0.9, -0.3, 0.2, 0.7, 0.99):
        l = jnp.array([[np.sqrt(1 - mu**2), 0.0, mu]], dtype=jnp.float32)
        got = float(np.asarray(sampling.phase_hg_plus_draine(v, l, d, 0)))
        want = w_d * float(np.asarray(sampling.phase_henyey_greenstein(v, l, g_hg))) + (
            1 - w_d
        ) * float(np.asarray(sampling.phase_draine(v, l, g_d, alpha_d)))
        assert abs(got - want) < 1e-4 * max(1.0, want)


@pytest.mark.slow
def test_hg_sampling_matches_phase():
    """Sampled cosθ histogram should match the HG phase function."""
    g = 0.5
    inc = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (400_000, 3))
    _, d = sampling.sample_henyey_greenstein(_states(400_000), inc, g)
    mu = np.asarray(d[:, 2])
    hist, edges = np.histogram(mu, bins=50, range=(-1, 1), density=True)
    centers = (edges[:-1] + edges[1:]) / 2
    # marginal pdf over cosθ = 2π * phase
    expected = 2 * np.pi * np.asarray(
        sampling.phase_henyey_greenstein(
            jnp.array([[0.0, 0.0, 1.0]]),
            jnp.stack([np.sqrt(np.clip(1 - centers**2, 0, 1)), np.zeros_like(centers), centers], axis=-1),
            g,
        )
    )
    # density normalization: histogram integrates to 1 over [-1,1]
    np.testing.assert_allclose(hist / 2, expected / 2, rtol=0.1, atol=0.02)


def test_rayleigh_sampling_matches_phase():
    inc = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (400_000, 3))
    _, d = sampling.sample_rayleigh(_states(400_000), inc)
    mu = np.asarray(d[:, 2])
    hist, edges = np.histogram(mu, bins=40, range=(-1, 1), density=True)
    centers = (edges[:-1] + edges[1:]) / 2
    expected = 2 * np.pi * (3.0 / (16 * np.pi)) * (1 + centers**2)
    np.testing.assert_allclose(hist, expected, rtol=0.08, atol=0.02)


def test_scatter_distance_exponential():
    _, d = sampling.sample_scatter_distance(_states(100_000), 2.0)
    d = np.asarray(d)
    assert abs(d.mean() - 0.5) < 0.01
