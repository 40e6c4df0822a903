import numpy as np
import jax.numpy as jnp

from vpt_tpu.accel import traverse
from vpt_tpu.accel.bvh import LEAF_SIZE, build_bvh
from vpt_tpu.accel.cluster import CLUSTER_SIZE, PACKET_SIZE, build_clusters, intersect_clusters


def _random_tris(n, rng):
    base = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    v1 = base + rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    return base, v1, v2


def _scene(n_tris, seed):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = _random_tris(n_tris, rng)
    bvh = build_bvh(v0, v1, v2)
    order = bvh.tri_order

    def pad(a):
        return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

    p0 = pad(v0[order])
    e1 = pad((v1 - v0)[order])
    e2 = pad((v2 - v0)[order])
    cl = build_clusters(bvh, p0, e1, e2)
    return p0, e1, e2, cl, rng


def test_cluster_build_covers_all_tris():
    p0, e1, e2, cl, _ = _scene(777, 0)
    starts = np.asarray(cl.start)
    counts = np.asarray(cl.count)
    # The list is padded to a GROUP_SIZE multiple with empty clusters.
    from vpt_tpu.accel.cluster import GROUP_SIZE

    assert len(counts) % GROUP_SIZE == 0
    real = counts > 0
    starts, counts = starts[real], counts[real]
    # Clusters tile [0, n_tris) without overlap
    order = np.argsort(starts)
    s, c = starts[order], counts[order]
    assert s[0] == 0
    np.testing.assert_array_equal(s[1:], s[:-1] + c[:-1])
    assert s[-1] + c[-1] == 777
    assert counts.max() <= CLUSTER_SIZE
    # Dense blocks hold the right triangles (component-major (C, 3, K))
    for ci in [0, len(s) // 2, len(s) - 1]:
        np.testing.assert_array_equal(
            np.asarray(cl.p0)[ci, :, : counts[ci]].T,
            p0[starts[ci] : starts[ci] + counts[ci]],
        )


def test_cluster_matches_brute_force():
    p0, e1, e2, cl, rng = _scene(900, 1)
    n_rays = 640
    org = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    brute = traverse.intersect_brute(
        jnp.asarray(org), jnp.asarray(d),
        jnp.asarray(p0[:900]), jnp.asarray(e1[:900]), jnp.asarray(e2[:900]),
    )
    hit = intersect_clusters(jnp.asarray(org), jnp.asarray(d), cl)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(brute.t), rtol=1e-4, atol=1e-5)
    agree = (np.asarray(hit.tri) == np.asarray(brute.tri)) | (np.asarray(brute.t) < 0)
    assert agree.mean() > 0.995


def test_cluster_nonmultiple_packet_and_active_mask():
    p0, e1, e2, cl, rng = _scene(300, 2)
    n_rays = 100  # not a multiple of the packet size
    org = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_clusters(jnp.asarray(org), jnp.asarray(d), cl)
    assert hit.t.shape == (100,)

    active = jnp.zeros(n_rays, bool)
    masked = intersect_clusters(jnp.asarray(org), jnp.asarray(d), cl, active=active)
    assert np.all(np.asarray(masked.t) < 0)


def test_cluster_any_hit_agrees_on_hit_mask():
    p0, e1, e2, cl, rng = _scene(500, 3)
    org = rng.uniform(-8, 8, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    closest = intersect_clusters(jnp.asarray(org), jnp.asarray(d), cl)
    anyh = intersect_clusters(jnp.asarray(org), jnp.asarray(d), cl, any_hit=True)
    np.testing.assert_array_equal(np.asarray(anyh.t >= 0), np.asarray(closest.t >= 0))
