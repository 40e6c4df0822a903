"""Parity tests for the round-based dense traversal (vpt_tpu.accel.rounds).

The rounds path is the round-3 perf re-design of TraceRay
(/root/reference/PathTracer/Shaders/RTCommon.slang:47-117): per round each
ray is assigned its next entered group front-to-back, rays are sorted by
that single group id (dense 128-lane MT rows), and a stream-kernel
fallback finishes rays with more than r_cap candidate groups.  Interpret
mode on CPU vs the XLA visit-loop fallback (brute-force-verified in
test_visit_kernel/test_cluster), covering closest-hit ordering, per-ray
any-hit semantics, mixed wavefronts, dead lanes, padding, r_cap=0 (pure
fallback) and large r_cap (no fallback).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.accel import traverse
from vpt_tpu.accel.cluster import intersect_clusters
from vpt_tpu.accel.rounds import intersect_rounds
from tests.test_stream_kernel import _scene, _rays, _assert_hits_equal


def test_rounds_matches_xla_random():
    p0, e1, e2, cl, rng = _scene(600, 30)
    org, d = _rays(rng, 256)
    rd = intersect_rounds(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(rd, xla)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:600]), jnp.asarray(e1[:600]), jnp.asarray(e2[:600])
    )
    np.testing.assert_allclose(np.asarray(rd.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_rounds_rcap_extremes():
    # r_cap=0 = pure stream fallback; r_cap=12 = (virtually) no fallback.
    _, _, _, cl, rng = _scene(900, 31)
    org, d = _rays(rng, 256)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    for r_cap in (0, 12):
        rd = intersect_rounds(org, d, cl, r_cap=r_cap, interpret=True)
        _assert_hits_equal(rd, xla)


@pytest.mark.slow
def test_rounds_multi_cluster():
    _, _, _, cl, rng = _scene(4000, 32)
    assert cl.n_clusters > 8
    org, d = _rays(rng, 512)
    rd = intersect_rounds(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(rd, xla)


@pytest.mark.slow
def test_rounds_anyhit_per_ray_tmax():
    p0, e1, e2, cl, rng = _scene(800, 33)
    n = 256
    org, d = _rays(rng, n)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:800]), jnp.asarray(e1[:800]), jnp.asarray(e2[:800])
    )
    t_true = np.asarray(brute.t)
    has = t_true >= 0
    below = jnp.asarray(np.where(has, t_true * 0.5, 1e-3).astype(np.float32))
    above = jnp.asarray(np.where(has, t_true * 1.01 + 1e-4, 1e8).astype(np.float32))
    ah = jnp.ones(n, bool)

    rd_b = intersect_rounds(org, d, cl, t_max=below, anyhit=ah, interpret=True)
    assert not np.any(np.asarray(rd_b.t)[has] >= 0), "hit beyond per-ray t_max"
    rd_a = intersect_rounds(org, d, cl, t_max=above, anyhit=ah, interpret=True)
    assert np.all(np.asarray(rd_a.t)[has] >= 0), "missed a hit inside per-ray t_max"
    ta = np.asarray(rd_a.t)[has]
    assert np.all(ta <= np.asarray(above)[has] + 1e-4)
    assert np.all(ta >= t_true[has] * (1 - 1e-4))


def test_rounds_mixed_anyhit_dead_padding():
    # 300 rays (padding), every third inactive, odd lanes any-hit — the
    # merged main+shadow wavefront shape in one go.
    p0, e1, e2, cl, rng = _scene(700, 34)
    n = 300
    org, d = _rays(rng, n)
    active = jnp.asarray(np.arange(n) % 3 != 2)
    ah = jnp.asarray(np.arange(n) % 2 == 1)
    rd = intersect_rounds(org, d, cl, active=active, anyhit=ah, interpret=True)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:700]), jnp.asarray(e1[:700]), jnp.asarray(e2[:700])
    )
    t_true = np.asarray(brute.t)
    act = np.asarray(active)
    m_closest = act & ~np.asarray(ah)
    t_rd = np.asarray(rd.t)
    np.testing.assert_allclose(t_rd[m_closest], t_true[m_closest], rtol=1e-5, atol=1e-6)
    m_ah = act & np.asarray(ah)
    np.testing.assert_array_equal(t_rd[m_ah] >= 0, t_true[m_ah] >= 0)
    hot = m_ah & (t_true >= 0)
    assert np.all(t_rd[hot] >= t_true[hot] * (1 - 1e-4))
    assert np.all(t_rd[~act] < 0)
    assert rd.t.shape == (n,)
