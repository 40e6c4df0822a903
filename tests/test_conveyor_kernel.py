"""Parity tests for the conveyor trace kernel (vpt_tpu.accel.conveyor).

The conveyor kernel is the round-3 grid-pipelined TraceRay re-expression
(/root/reference/PathTracer/Shaders/RTCommon.slang:47-117): a flat
entry-sorted (supertile, group) work-item grid with scalar-prefetch
index maps, overflow continuation, and exact per-ray front-to-back
early termination.  Interpret mode on CPU vs the XLA visit-loop
fallback (itself brute-force-verified in test_visit_kernel /
test_cluster), covering closest-hit ordering, any-hit semantics, mixed
wavefronts, instancing, dead lanes, padding, and the overflow path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.accel import traverse
from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh
from vpt_tpu.accel.cluster import (
    assemble_clusters, build_clusters, build_mesh_clusters, intersect_clusters,
)
from vpt_tpu.accel.conveyor import intersect_conveyor


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


@pytest.mark.slow
def test_conveyor_matches_xla_random():
    p0, e1, e2, cl, rng = _scene(600, 20)
    org, d = _rays(rng, 256)
    cv = intersect_conveyor(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(cv, xla)
    brute = traverse.intersect_brute(
        org, d, jnp.asarray(p0[:600]), jnp.asarray(e1[:600]), jnp.asarray(e2[:600])
    )
    np.testing.assert_allclose(
        np.asarray(cv.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_conveyor_anyhit_and_dead_lanes():
    _, _, _, cl, rng = _scene(400, 7)
    org, d = _rays(rng, 1024 + 256)   # non-multiple of 1024: padding path
    n = org.shape[0]
    active = jnp.asarray(rng.uniform(size=n) > 0.25)
    anyhit = jnp.asarray(rng.uniform(size=n) > 0.5)
    cv = intersect_conveyor(org, d, cl, active=active, anyhit=anyhit,
                            interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    act = np.asarray(active)
    ah = np.asarray(anyhit)
    # Dead lanes report no hit.
    assert np.all(np.asarray(cv.tri)[~act] == -1)
    # Closest-hit active lanes match the fallback exactly.
    ch = act & ~ah
    np.testing.assert_allclose(
        np.asarray(cv.t)[ch], np.asarray(xla.t)[ch], rtol=1e-5, atol=1e-6
    )
    # Any-hit lanes: found iff the fallback found, and the reported hit is
    # a real one (t <= closest would be wrong — any hit below tmax).
    found_cv = np.asarray(cv.tri)[act & ah] >= 0
    found_x = np.asarray(xla.tri)[act & ah] >= 0
    np.testing.assert_array_equal(found_cv, found_x)


@pytest.mark.slow
def test_conveyor_overflow_continuation(monkeypatch):
    """Force tiny K_SLOTS so most supertiles overflow into the
    continuation loop; results must stay exact."""
    import vpt_tpu.accel.conveyor as conv

    monkeypatch.setattr(conv, "K_SLOTS", 3)
    p0, e1, e2, cl, rng = _scene(1500, 3)
    org, d = _rays(rng, 1024)
    cv = conv.intersect_conveyor(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(cv, xla)


@pytest.mark.slow
def test_conveyor_instancing():
    # Two instances of one mesh (non-uniform scale + rotation): in-kernel
    # world->local ray transforms must match the XLA path.
    rng = np.random.default_rng(25)
    v0 = rng.uniform(-2, 2, (900, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (900, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (900, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order

    def pad(a):
        return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

    mc = build_mesh_clusters(
        bvh, pad(v0[order]), pad((v1 - v0)[order]), pad((v2 - v0)[order])
    )
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
    cv = intersect_conveyor(org, d, cl, interpret=True)
    xla = intersect_clusters(org, d, cl, use_pallas=False)
    _assert_hits_equal(cv, xla)
