import time

import numpy as np
import pytest

from vpt_tpu.accel import native
from vpt_tpu.accel.bvh import build_bvh


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    v1 = base + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return base, v1, v2


pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_native_structural_invariants():
    v0, v1, v2 = _random_tris(5000)
    bvh = build_bvh(v0, v1, v2, use_native=True)
    n = 5000
    assert np.sort(bvh.tri_order).tolist() == list(range(n))
    leaf = bvh.tri_count > 0
    assert bvh.tri_count[leaf].sum() == n
    # Leaves tile the reordered array contiguously in DFS order
    firsts = bvh.first_tri[leaf]
    counts = bvh.tri_count[leaf]
    o = np.argsort(firsts)
    np.testing.assert_array_equal(firsts[o][1:], firsts[o][:-1] + counts[o][:-1])
    # Skip links strictly forward
    inner = ~leaf
    skips = bvh.skip
    ids = np.arange(bvh.n_nodes)
    fwd = (skips > ids) | (skips == np.int32(2**31 - 1))
    assert fwd.all()
    # Inner node children AABBs contained
    for nid in np.nonzero(inner)[0][:100]:
        assert np.all(bvh.aabb_min[nid] <= bvh.aabb_min[nid + 1] + 1e-5)
        assert np.all(bvh.aabb_max[nid] >= bvh.aabb_max[nid + 1] - 1e-5)


def test_native_matches_numpy_traversal_results():
    """Native and NumPy builders may produce different (both valid) trees —
    verify equivalence by tracing rays through both."""
    import jax.numpy as jnp

    from vpt_tpu.accel import traverse
    from vpt_tpu.accel.bvh import LEAF_SIZE

    v0, v1, v2 = _random_tris(800, seed=2)
    rng = np.random.default_rng(3)
    org = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    results = []
    for use_native in (False, True):
        bvh = build_bvh(v0, v1, v2, use_native=use_native)
        order = bvh.tri_order

        def pad(a):
            return np.concatenate([a, np.zeros((LEAF_SIZE,) + a.shape[1:], a.dtype)])

        hit = traverse.intersect_bvh(
            jnp.asarray(org), jnp.asarray(d),
            jnp.asarray(bvh.aabb_min), jnp.asarray(bvh.aabb_max),
            jnp.asarray(bvh.first_tri), jnp.asarray(bvh.tri_count), jnp.asarray(bvh.skip),
            jnp.asarray(pad(v0[order])), jnp.asarray(pad((v1 - v0)[order])),
            jnp.asarray(pad((v2 - v0)[order])),
        )
        # Map reordered slots back to original triangle ids
        tri_orig = np.where(np.asarray(hit.tri) >= 0, order[np.clip(np.asarray(hit.tri), 0, 799)], -1)
        results.append((np.asarray(hit.t), tri_orig))

    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-4, atol=1e-5)
    agree = (results[0][1] == results[1][1]) | (results[0][0] < 0)
    assert agree.mean() > 0.99


@pytest.mark.slow
def test_native_speed_advantage():
    v0, v1, v2 = _random_tris(120_000, seed=5)
    t0 = time.perf_counter()
    build_bvh(v0, v1, v2, use_native=True)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_bvh(v0, v1, v2, use_native=False)
    numpy_t = time.perf_counter() - t0
    assert native_t < numpy_t, f"native {native_t:.2f}s vs numpy {numpy_t:.2f}s"
