"""Parity tests for the any-hit occlusion kernel (vpt_tpu.accel.occlude).

Oracle: a full closest-hit trace (intersect_clusters, itself brute-force-
verified) with blocked := found & tri != exclude_tri — exactly the
reference's shadow semantics (sky: DoesRayIntersectWithAS,
RTCommon.slang:47-84; light: closest==target, ClosestHit.slang:169-176).
Any-hit with exclusion must agree except for exact-distance ties, which
random scenes make measure-zero."""

import pytest
import numpy as np
import jax.numpy as jnp

from vpt_tpu.accel.cluster import intersect_clusters
from vpt_tpu.accel.occlude import occlude_stream
from test_stream_kernel import _scene, _rays


def _oracle_blocked(p0, e1, e2, cl, org, d, t_min, tmax, active, extri):
    hit = intersect_clusters(
        cl=cl, origin=org, direction=d, t_min=t_min, t_max=tmax,
        active=active, sort_rays=False,
    )
    return np.asarray((hit.t >= 0.0) & (hit.tri != extri))


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_occlude_sky_semantics():
    """exclude_tri = -1: blocked iff ANY hit below t_max."""
    p0, e1, e2, cl, rng = _scene(600, seed=3)
    org, d = _rays(rng, 512)
    tmax = jnp.asarray(rng.uniform(0.5, 30.0, 512).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=512) < 0.9)
    blocked = occlude_stream(
        org, d, cl, t_min=1e-4, t_max=tmax, active=active, interpret=True
    )
    expect = _oracle_blocked(p0, e1, e2, cl, org, d, 1e-4, tmax, active,
                             jnp.full(512, -1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(blocked), expect)
    # Inactive rays never report blocked
    assert not np.any(np.asarray(blocked)[~np.asarray(active)])


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_occlude_excluded_triangle():
    """Light-NEE: rays aimed at a known triangle with that id excluded must
    NOT be blocked by it, but other geometry still blocks."""
    p0, e1, e2, cl, rng = _scene(400, seed=11)
    n = 384
    org, d = _rays(rng, n)
    # Closest-hit oracle tells us which tri each ray hits first
    hit = intersect_clusters(cl=cl, origin=org, direction=d, t_min=1e-4,
                             t_max=1e9, active=jnp.ones(n, bool), sort_rays=False)
    tri = np.asarray(hit.tri)
    t = np.asarray(hit.t)
    tmax = jnp.asarray(np.where(t >= 0, t * 1.5, 10.0).astype(np.float32))
    extri = jnp.asarray(tri.astype(np.int32))  # exclude each ray's own first hit
    blocked = occlude_stream(
        org, d, cl, t_min=1e-4, t_max=tmax, active=jnp.ones(n, bool),
        exclude_tri=extri, interpret=True,
    )
    expect = _oracle_blocked(p0, e1, e2, cl, org, d, 1e-4, tmax,
                             jnp.ones(n, bool), extri)
    # The oracle (closest != extri) and any-hit-with-exclusion agree except
    # when a SECOND triangle lies between the first hit and tmax: the
    # oracle's closest == extri says visible while a farther occluder
    # exists.  Any-hit (correctly, for shadows) reports blocked there.
    got = np.asarray(blocked)
    disagree = got != expect
    if disagree.any():
        # every disagreement must be got=True (a real farther occluder)
        assert np.all(got[disagree]), "any-hit missed a blocker the oracle found"
        # verify a farther hit exists by re-tracing beyond the first hit
        idx = np.where(disagree)[0]
        org2 = np.asarray(org)[idx] + np.asarray(d)[idx] * (t[idx, None] * 1.001)
        hit2 = intersect_clusters(
            cl=cl, origin=jnp.asarray(org2), direction=jnp.asarray(d)[idx],
            t_min=1e-5, t_max=jnp.asarray(tmax)[idx] - t[idx] * 1.001,
            active=jnp.ones(len(idx), bool), sort_rays=False,
        )
        assert np.all(np.asarray(hit2.t) >= 0), "any-hit blocked without occluder"


@pytest.mark.slow  # ~2 min XLA:CPU compile of the interpret-mode kernel
def test_occlude_mixed_padding():
    """Non-multiple-of-band wavefronts pad correctly."""
    p0, e1, e2, cl, rng = _scene(300, seed=7)
    n = 777
    org, d = _rays(rng, n)
    active = jnp.asarray(rng.uniform(size=n) < 0.8)
    blocked = occlude_stream(
        org, d, cl, t_min=1e-4, t_max=25.0, active=active, interpret=True
    )
    assert blocked.shape == (n,)
    expect = _oracle_blocked(p0, e1, e2, cl, org, d, 1e-4,
                             jnp.full(n, 25.0), active, jnp.full(n, -1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(blocked), expect)
