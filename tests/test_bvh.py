import numpy as np
import jax.numpy as jnp

from vpt_tpu.accel import traverse
from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh


def _random_tris(n, rng):
    base = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _pad(a):
    return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])


def test_bvh_structure_invariants():
    rng = np.random.default_rng(0)
    v0, v1, v2 = _random_tris(500, rng)
    bvh = build_bvh(v0, v1, v2)
    counts = bvh.tri_count
    # Leaves cover every triangle exactly once
    assert np.sort(bvh.tri_order).tolist() == list(range(500))
    leaf = counts > 0
    assert counts[leaf].sum() == 500
    # Inner node i has left child i+1 with a contained AABB
    inner = np.nonzero(~leaf)[0]
    for nid in inner[:50]:
        assert np.all(bvh.aabb_min[nid] <= bvh.aabb_min[nid + 1] + 1e-5)
        assert np.all(bvh.aabb_max[nid] >= bvh.aabb_max[nid + 1] - 1e-5)


def test_bvh_matches_brute_force():
    rng = np.random.default_rng(1)
    v0, v1, v2 = _random_tris(300, rng)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order
    p0 = _pad(v0[order])
    e1 = _pad((v1 - v0)[order])
    e2 = _pad((v2 - v0)[order])

    n_rays = 512
    org = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    brute = traverse.intersect_brute(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(p0[:300]), jnp.asarray(e1[:300]), jnp.asarray(e2[:300])
    )
    hit = traverse.intersect_bvh(
        jnp.asarray(org), jnp.asarray(d),
        jnp.asarray(bvh.aabb_min), jnp.asarray(bvh.aabb_max),
        jnp.asarray(bvh.first_tri), jnp.asarray(bvh.tri_count), jnp.asarray(bvh.skip),
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
    )
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5)
    # Same triangle wherever there's a hit (modulo shared-edge ties)
    bt = np.asarray(brute.t)
    agree = (np.asarray(hit.tri) == np.asarray(brute.tri)) | (bt < 0)
    assert agree.mean() > 0.99


def test_bvh_any_hit_and_active_mask():
    rng = np.random.default_rng(2)
    v0, v1, v2 = _random_tris(100, rng)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order
    p0 = _pad(v0[order]); e1 = _pad((v1 - v0)[order]); e2 = _pad((v2 - v0)[order])
    org = rng.uniform(-8, 8, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    args = (
        jnp.asarray(bvh.aabb_min), jnp.asarray(bvh.aabb_max),
        jnp.asarray(bvh.first_tri), jnp.asarray(bvh.tri_count), jnp.asarray(bvh.skip),
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
    )
    closest = traverse.intersect_bvh(jnp.asarray(org), jnp.asarray(d), *args)
    anyhit = traverse.intersect_bvh(jnp.asarray(org), jnp.asarray(d), *args, any_hit=True)
    # any-hit finds a hit iff closest-hit does
    np.testing.assert_array_equal(np.asarray(anyhit.t >= 0), np.asarray(closest.t >= 0))

    active = jnp.zeros(64, bool)
    masked = traverse.intersect_bvh(jnp.asarray(org), jnp.asarray(d), *args, active=active)
    assert np.all(np.asarray(masked.t) < 0)
