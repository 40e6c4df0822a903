"""Ray-scene intersection on TPU.

The reference's `TraceRay` / ray queries (RTCommon.slang:47-117) run on RT
cores; here they are data-parallel JAX ops over the whole ray wavefront:

* `intersect_brute` — all-pairs Möller–Trumbore, vectorized over rays ×
  triangles.  Optimal for small scenes (the VPU chews through a few thousand
  triangles faster than divergent traversal) and the ground truth the BVH
  path is validated against.
* `intersect_bvh` — stackless skip-link traversal of the flattened BVH from
  vpt_tpu.accel.bvh.  All rays advance one node per `while_loop` iteration
  with masked lanes; leaf hits test a fixed-width block of triangles.

Both return a `Hit` SoA pytree; `t < 0` means miss (matching the reference's
GetDistanceToGeometry convention, RTCommon.slang:86-117).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vpt_tpu.accel.bvh import LEAF_SIZE, SENTINEL

T_MIN = 1e-4
T_MAX = 1e8


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) f32, -1 on miss
    tri: jnp.ndarray  # (N,) i32 global (reordered) triangle slot, -1 on miss
    u: jnp.ndarray  # (N,) f32 barycentric of v1
    v: jnp.ndarray  # (N,) f32 barycentric of v2

    @property
    def hit_mask(self) -> jnp.ndarray:
        return self.t >= 0.0


def _moller_trumbore(origin, direction, p0, e1, e2, t_min, t_max):
    """Batched Möller–Trumbore. origin/direction (..., 3); p0/e1/e2 (..., 3).

    Returns (t, u, v, valid).  Two-sided (the reference shades backfaces).
    """
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


def intersect_brute(origin, direction, tri_p0, tri_e1, tri_e2, t_min=T_MIN, t_max=T_MAX) -> Hit:
    """Closest hit by testing every ray against every triangle.

    origin/direction: (N, 3); tri arrays: (T, 3).  O(N*T) VPU work — use for
    scenes up to a few thousand triangles or as a reference oracle.
    `t_max` may be per-ray (N,)."""
    o = origin[:, None, :]
    d = direction[:, None, :]
    t_max = jnp.asarray(t_max, jnp.float32)
    if t_max.ndim == 1:
        t_max = t_max[:, None]
    t, u, v, valid = _moller_trumbore(o, d, tri_p0[None], tri_e1[None], tri_e2[None], t_min, t_max)
    t_masked = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=1)
    n = origin.shape[0]
    rows = jnp.arange(n)
    best_t = t_masked[rows, best]
    hit = jnp.isfinite(best_t)
    return Hit(
        t=jnp.where(hit, best_t, -1.0),
        tri=jnp.where(hit, best.astype(jnp.int32), -1),
        u=jnp.where(hit, u[rows, best], 0.0),
        v=jnp.where(hit, v[rows, best], 0.0),
    )


def intersect_bvh(
    origin,
    direction,
    nodes_min,
    nodes_max,
    node_first,
    node_count,
    node_skip,
    tri_p0,
    tri_e1,
    tri_e2,
    t_min=T_MIN,
    t_max=T_MAX,
    active=None,
    any_hit: bool = False,
) -> Hit:
    """Stackless skip-link BVH traversal for a whole ray wavefront.

    All arrays are device-resident; triangle arrays must be padded with
    LEAF_SIZE degenerate triangles at the end so fixed-width leaf gathers
    never read out of bounds.

    `active`: optional (N,) bool — inactive rays skip traversal entirely.
    `any_hit`: stop a ray at its first confirmed intersection (shadow /
    visibility queries that only need a boolean).
    """
    n = origin.shape[0]
    inv_dir = jnp.where(jnp.abs(direction) > 1e-20, 1.0 / direction, jnp.float32(1e20))

    node0 = jnp.zeros(n, jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, SENTINEL)

    init = (
        node0,
        jnp.full(n, jnp.float32(t_max)),  # best t so far (also culls AABBs)
        jnp.full(n, -1, jnp.int32),  # best tri
        jnp.zeros(n, jnp.float32),  # u
        jnp.zeros(n, jnp.float32),  # v
    )

    def cond(carry):
        node, *_ = carry
        return jnp.any(node != SENTINEL)

    def body(carry):
        node, best_t, best_tri, best_u, best_v = carry
        live = node != SENTINEL
        nid = jnp.where(live, node, 0)

        nmin = nodes_min[nid]
        nmax = nodes_max[nid]
        t0 = (nmin - origin) * inv_dir
        t1 = (nmax - origin) * inv_dir
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
        t_far = jnp.minimum(jnp.min(tf, axis=-1), best_t)
        aabb_hit = t_near <= t_far

        count = node_count[nid]
        first = node_first[nid]
        is_leaf = count > 0

        # Fixed-width leaf triangle test (masked lanes for count < LEAF_SIZE).
        do_tris = live & aabb_hit & is_leaf
        base = jnp.where(do_tris, first, 0)
        offs = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
        tid = base[:, None] + offs[None, :]
        p0 = tri_p0[tid]
        e1 = tri_e1[tid]
        e2 = tri_e2[tid]
        t, u, v, valid = _moller_trumbore(
            origin[:, None, :], direction[:, None, :], p0, e1, e2, t_min, t_max
        )
        valid = valid & do_tris[:, None] & (offs[None, :] < count[:, None]) & (t[:, :] < best_t[:, None])
        t_masked = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=1)
        rows = jnp.arange(n)
        cand_t = t_masked[rows, j]
        better = jnp.isfinite(cand_t)
        best_t = jnp.where(better, cand_t, best_t)
        best_tri = jnp.where(better, tid[rows, j], best_tri)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)

        # Advance: inner+hit -> first child (nid+1); else skip link.
        descend = aabb_hit & ~is_leaf
        nxt = jnp.where(descend, nid + 1, node_skip[nid])
        if any_hit:
            nxt = jnp.where(best_tri >= 0, SENTINEL, nxt)
        node = jnp.where(live, nxt, SENTINEL)
        return node, best_t, best_tri, best_u, best_v

    node, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, init)
    found = best_tri >= 0
    return Hit(
        t=jnp.where(found, best_t, -1.0),
        tri=best_tri,
        u=best_u,
        v=best_v,
    )
