"""Parity tests for the Pallas visit kernel (vpt_tpu.accel.visit_kernel).

The kernel replaces TraceRay/RayQuery hardware traversal
(/root/reference/PathTracer/Shaders/RTCommon.slang:47-117) and produces
every TPU pixel — these tests run it in interpret mode on CPU against the
XLA visit-loop fallback and brute force, so CI fails if its semantics ever
drift from the reference ordering (closest hit, earliest-index tie-break,
any-hit early exit with per-ray t_max).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.accel import traverse
from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh
from vpt_tpu.accel.cluster import build_clusters, intersect_clusters


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


def _both(org, d, cl, **kw):
    """Run the interpret-mode Pallas kernel and the XLA fallback."""
    pk = intersect_clusters(org, d, cl, use_pallas=True, interpret=True, **kw)
    xla = intersect_clusters(org, d, cl, use_pallas=False, **kw)
    return pk, xla


def _assert_hits_equal(a, b, tie_tol=1e-5):
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    np.testing.assert_allclose(ta, tb, rtol=1e-5, atol=1e-6)
    # Triangle ids must agree except where two triangles tie on t within
    # float tolerance (both orderings are then reference-legal).
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


def test_pallas_matches_xla_and_brute_random():
    p0, e1, e2, cl, rng = _scene(500, 10)
    org, d = _rays(rng, 128)
    pk, xla = _both(org, d, cl)
    _assert_hits_equal(pk, xla)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:500]), jnp.asarray(e1[:500]), jnp.asarray(e2[:500])
    )
    np.testing.assert_allclose(np.asarray(pk.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_matches_xla_multi_cluster():
    # > CLUSTER_SIZE triangles so the candidate lists are non-trivial.
    _, _, _, cl, rng = _scene(4000, 11)
    assert cl.n_clusters > 1
    org, d = _rays(rng, 640)
    pk, xla = _both(org, d, cl)
    _assert_hits_equal(pk, xla)


@pytest.mark.slow
def test_pallas_with_ray_sorting():
    _, _, _, cl, rng = _scene(2500, 12)
    org, d = _rays(rng, 384)
    pk = intersect_clusters(org, d, cl, use_pallas=True, interpret=True, sort_rays=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False, sort_rays=False)
    _assert_hits_equal(pk, xla)


def test_pallas_any_hit_per_ray_tmax():
    p0, e1, e2, cl, rng = _scene(800, 13)
    n = 128
    org, d = _rays(rng, n)
    # Establish true closest hits, then set each ray's t_max just below /
    # above its own hit distance: any_hit must miss / hit accordingly.
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:800]), jnp.asarray(e1[:800]), jnp.asarray(e2[:800])
    )
    t_true = np.asarray(brute.t)
    has = t_true >= 0
    below = jnp.asarray(np.where(has, t_true * 0.5, 1e-3).astype(np.float32))
    above = jnp.asarray(np.where(has, t_true * 1.01 + 1e-4, 1e8).astype(np.float32))

    pk_b, xla_b = _both(org, d, cl, any_hit=True, t_max=below)
    np.testing.assert_array_equal(np.asarray(pk_b.t >= 0), np.asarray(xla_b.t >= 0))
    assert not np.any(np.asarray(pk_b.t)[has] >= 0), "hit beyond per-ray t_max"

    pk_a, xla_a = _both(org, d, cl, any_hit=True, t_max=above)
    np.testing.assert_array_equal(np.asarray(pk_a.t >= 0), np.asarray(xla_a.t >= 0))
    assert np.all(np.asarray(pk_a.t)[has] >= 0), "missed a hit inside per-ray t_max"
    # Any-hit t values must be genuine intersections (<= t_max, >= closest).
    ta = np.asarray(pk_a.t)[has]
    assert np.all(ta <= np.asarray(above)[has] + 1e-4)
    assert np.all(ta >= t_true[has] * (1 - 1e-4))


def test_pallas_all_dead_packet():
    _, _, _, cl, rng = _scene(800, 14)
    org, d = _rays(rng, 256)
    active = jnp.zeros(256, bool)
    pk = intersect_clusters(
        org, d, cl, active=active, use_pallas=True, interpret=True
    )
    assert np.all(np.asarray(pk.t) < 0)
    assert np.all(np.asarray(pk.tri) == -1)


@pytest.mark.slow
def test_pallas_mixed_active_lanes():
    _, _, _, cl, rng = _scene(800, 15)
    org, d = _rays(rng, 256)
    active = jnp.asarray(np.arange(256) % 3 == 0)
    pk = intersect_clusters(org, d, cl, active=active, use_pallas=True, interpret=True)
    xla = intersect_clusters(org, d, cl, active=active, use_pallas=False)
    _assert_hits_equal(pk, xla)
    assert np.all(np.asarray(pk.t)[~np.asarray(active)] < 0)


@pytest.mark.slow
def test_pallas_grazing_axis_aligned():
    # Axis-aligned quad grid + rays exactly parallel to / grazing the
    # cluster AABB faces (zero direction components -> inv-dir clamping).
    n = 128
    xs = np.linspace(-4, 4, 16, dtype=np.float32)
    tris = []
    for x in xs:
        for y in xs[:8]:
            tris.append(([x, y, 0.0], [x + 0.5, y, 0.0], [x, y + 0.5, 0.0]))
    v0 = np.array([t[0] for t in tris], np.float32)
    v1 = np.array([t[1] for t in tris], np.float32)
    v2 = np.array([t[2] for t in tris], np.float32)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order

    def pad(a):
        return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

    cl = build_clusters(bvh, pad(v0[order]), pad((v1 - v0)[order]), pad((v2 - v0)[order]))

    rng = np.random.default_rng(16)
    org = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    # Straight-down rays (graze triangle plane edge-on have d.z = -1)
    org[:, 0] = rng.uniform(-4, 4.5, n)
    org[:, 1] = rng.uniform(-4, 0.5, n)
    org[:, 2] = 1.0
    d[:, 2] = -1.0
    # A few rays exactly in the z=0 plane (parallel to every triangle)
    org[:8, 2] = 0.0
    d[:8] = [1.0, 0.0, 0.0]
    pk, xla = _both(jnp.asarray(org), jnp.asarray(d), cl)
    _assert_hits_equal(pk, xla)
    assert np.asarray(pk.t)[8:].max() > 0  # the grid is actually being hit


@pytest.mark.slow
def test_pallas_partial_last_cluster():
    # Triangle count chosen so the last cluster is nearly empty — exercises
    # the in-range mask on padded slots.
    _, _, _, cl, rng = _scene(1025, 17)
    org, d = _rays(rng, 256)
    pk, xla = _both(org, d, cl)
    _assert_hits_equal(pk, xla)
