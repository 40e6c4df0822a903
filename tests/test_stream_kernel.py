"""Parity tests for the cluster-major stream kernel (vpt_tpu.accel.stream).

The stream kernel is the round-3 TraceRay re-expression
(/root/reference/PathTracer/Shaders/RTCommon.slang:47-117): rays resident
in VMEM, the grid streaming over candidate clusters, Moller-Trumbore only
on entering 128-ray rows.  These tests run it in interpret mode on CPU
against the XLA visit-loop fallback (itself brute-force-verified in
test_visit_kernel/test_cluster), covering closest-hit ordering, per-ray
any-hit semantics, mixed any-hit/closest wavefronts, instancing, dead
lanes, and band padding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.accel import traverse
from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh
from vpt_tpu.accel.cluster import (
    assemble_clusters, build_clusters, build_mesh_clusters, intersect_clusters,
)
from vpt_tpu.accel.stream import intersect_stream


def _scene(n_tris, seed, spread=5.0, tri_size=0.7):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-tri_size, tri_size, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-tri_size, tri_size, (n_tris, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order

    def pad(a):
        return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

    p0 = pad(v0[order])
    e1 = pad((v1 - v0)[order])
    e2 = pad((v2 - v0)[order])
    cl = build_clusters(bvh, p0, e1, e2)
    return p0, e1, e2, cl, rng


def _rays(rng, n, spread=8.0):
    org = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def _assert_hits_equal(a, b, tie_tol=1e-5):
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    np.testing.assert_allclose(ta, tb, rtol=1e-5, atol=1e-6)
    tie = np.abs(ta - tb) <= tie_tol + 1e-5 * np.abs(tb)
    ids_match = np.asarray(a.tri) == np.asarray(b.tri)
    assert np.all(ids_match | (tie & (ta >= 0))), (
        f"{(~(ids_match | tie)).sum()} rays disagree on tri id beyond t ties"
    )
    same = ids_match
    np.testing.assert_allclose(
        np.asarray(a.u)[same], np.asarray(b.u)[same], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.v)[same], np.asarray(b.v)[same], rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_stream_matches_xla_random():
    p0, e1, e2, cl, rng = _scene(600, 20)
    org, d = _rays(rng, 256)
    st = intersect_stream(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(st, xla)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:600]), jnp.asarray(e1[:600]), jnp.asarray(e2[:600])
    )
    np.testing.assert_allclose(np.asarray(st.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_stream_matches_xla_multi_cluster():
    _, _, _, cl, rng = _scene(4000, 21)
    assert cl.n_clusters > 8  # multiple groups
    org, d = _rays(rng, 512)
    st = intersect_stream(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(st, xla)


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_stream_anyhit_per_ray_tmax():
    p0, e1, e2, cl, rng = _scene(800, 22)
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

    st_b = intersect_stream(org, d, cl, t_max=below, anyhit=ah, interpret=True)
    assert not np.any(np.asarray(st_b.t)[has] >= 0), "hit beyond per-ray t_max"
    st_a = intersect_stream(org, d, cl, t_max=above, anyhit=ah, interpret=True)
    assert np.all(np.asarray(st_a.t)[has] >= 0), "missed a hit inside per-ray t_max"
    ta = np.asarray(st_a.t)[has]
    assert np.all(ta <= np.asarray(above)[has] + 1e-4)
    assert np.all(ta >= t_true[has] * (1 - 1e-4))


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_stream_mixed_anyhit_closest():
    # Half the wavefront closest-hit, half any-hit, interleaved — the merged
    # main+shadow trace shape.  Closest lanes must return exact closest
    # hits; any-hit lanes a genuine hit iff one exists below t_max.
    p0, e1, e2, cl, rng = _scene(1500, 23)
    n = 512
    org, d = _rays(rng, n)
    ah = jnp.asarray(np.arange(n) % 2 == 1)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:1500]), jnp.asarray(e1[:1500]), jnp.asarray(e2[:1500])
    )
    t_true = np.asarray(brute.t)
    st = intersect_stream(org, d, cl, anyhit=ah, interpret=True)
    t_st = np.asarray(st.t)
    m = ~np.asarray(ah)
    np.testing.assert_allclose(t_st[m], t_true[m], rtol=1e-5, atol=1e-6)
    # any-hit lanes: found iff brute found; found t is a real hit >= closest
    np.testing.assert_array_equal(t_st[~m] >= 0, t_true[~m] >= 0)
    hot = (~m) & (t_true >= 0)
    assert np.all(t_st[hot] >= t_true[hot] * (1 - 1e-4))


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_stream_dead_and_padding():
    _, _, _, cl, rng = _scene(700, 24)
    org, d = _rays(rng, 300)  # not a multiple of anything — exercises padding
    active = jnp.asarray(np.arange(300) % 3 == 0)
    st = intersect_stream(org, d, cl, active=active, interpret=True)
    xla = intersect_clusters(org, d, cl, active=active, use_pallas=False)
    _assert_hits_equal(st, xla)
    assert np.all(np.asarray(st.t)[~np.asarray(active)] < 0)
    assert st.t.shape == (300,)


@pytest.mark.slow
def test_stream_instanced():
    # Two instances of one mesh with different transforms (incl. non-uniform
    # scale): in-kernel world->local ray transforms must match the XLA path.
    rng = np.random.default_rng(25)
    v0 = rng.uniform(-2, 2, (900, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (900, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (900, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order

    def pad(a):
        return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

    mc = build_mesh_clusters(bvh, pad(v0[order]), pad((v1 - v0)[order]), pad((v2 - v0)[order]))
    m1 = np.eye(4, dtype=np.float32)
    m2 = np.diag([0.7, 1.4, 0.9, 1.0]).astype(np.float32)
    m2[:3, 3] = [6.0, -1.0, 2.0]
    theta = 0.6
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0] = rot[2, 2] = np.cos(theta)
    rot[0, 2] = np.sin(theta)
    rot[2, 0] = -np.sin(theta)
    m2 = m2 @ rot
    n_slots = mc.start.max() + 10000  # virtual id space per instance
    cl = assemble_clusters([mc, mc], [(0, m1, 0), (1, m2, int(n_slots))])
    org, d = _rays(rng, 384, spread=9.0)
    st = intersect_stream(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(st, xla)
