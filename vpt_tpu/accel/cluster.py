"""Cluster-culled intersection — the TPU-native "RT core".

Per-ray BVH traversal is gather-bound on TPU (measured ~6000x slower than
XLA's fused brute force).  Instead we cut the SAH BVH into *clusters* of up
to K contiguous triangles (subtree cuts, so each cluster is one dense slice
of the DFS-reordered triangle arrays) and intersect with a two-phase
wavefront scheme built from operations TPUs are good at:

1. **Cull** — a conservative interval-arithmetic slab test of each 128-ray
   packet bundle against every cluster AABB: a (P, C) entry-distance table,
   no (N, C) materialization.
2. **Visit** — each packet marches its entry-sorted candidate list in the
   Pallas kernel (vpt_tpu.accel.visit_kernel): exact per-ray AABB pre-test,
   then one contiguous cluster DMA + a (128 rays x K tris) Möller–Trumbore
   block, stopping when the next candidate starts beyond every live ray's
   best hit.  A pure-XLA visit loop below serves as the CPU/test fallback.

This replaces both the hardware BVH (PathTracer.cpp:433-502) and
TraceRay/RayQuery (RTCommon.slang:47-117).  Ordering/earliest-hit semantics
match closest-hit queries exactly; `any_hit` is the shadow-query shortcut.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.accel.bvh import FlatBVH
from vpt_tpu.accel.traverse import Hit, T_MAX, T_MIN

CLUSTER_SIZE = 1024  # tris per cluster: amortizes the per-visit scalar overhead
PACKET_SIZE = 128  # rays per packet
CULL_CHUNK = 128  # clusters per cull chunk; bounds the (N, chunk) transient
VISITS_PER_STEP = 4  # clusters each packet processes per visit-loop step


class ClusterData(NamedTuple):
    aabb_min: jnp.ndarray  # (C, 3)
    aabb_max: jnp.ndarray  # (C, 3)
    start: jnp.ndarray  # (C,) i32 — offset into reordered tri arrays
    count: jnp.ndarray  # (C,) i32 — triangles in the cluster (<= K)
    tris: jnp.ndarray  # (C, 16, K) dense blocks: rows 0-8 = [p0.xyz, e1.xyz,
    # e2.xyz], rows 9-15 padding (8-row DMA alignment).  Component-major so
    # per-axis slices keep triangles in VPU lanes and a whole cluster is one
    # contiguous DMA for the Pallas visit kernel.

    @property
    def p0(self):
        return self.tris[:, 0:3, :]

    @property
    def e1(self):
        return self.tris[:, 3:6, :]

    @property
    def e2(self):
        return self.tris[:, 6:9, :]

    @property
    def n_clusters(self) -> int:
        return int(self.aabb_min.shape[0])


def build_clusters(
    bvh: FlatBVH, tri_p0: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray,
    cluster_size: int = CLUSTER_SIZE,
) -> ClusterData:
    """Cut the BVH into subtree clusters of <= cluster_size triangles.

    tri_* are the *reordered* triangle arrays (bvh.tri_order applied).
    """
    n_nodes = bvh.n_nodes
    count = bvh.tri_count
    first = bvh.first_tri
    skip = bvh.skip

    # Subtree triangle ranges [lo, hi): reverse-index sweep (children have
    # larger indices in DFS pre-order; right child of inner i is skip[i+1]).
    lo = np.zeros(n_nodes, np.int64)
    hi = np.zeros(n_nodes, np.int64)
    for i in range(n_nodes - 1, -1, -1):
        if count[i] > 0:
            lo[i] = first[i]
            hi[i] = first[i] + count[i]
        else:
            right = skip[i + 1]
            lo[i] = lo[i + 1]
            hi[i] = hi[right]

    cut_nodes = []
    stack = [0]
    while stack:
        i = stack.pop()
        if hi[i] - lo[i] <= cluster_size:
            cut_nodes.append(i)
        else:
            stack.append(i + 1)
            stack.append(skip[i + 1])
    cut_nodes.sort(key=lambda i: lo[i])

    # Greedily merge adjacent cuts (contiguous in DFS order, so still one
    # dense slice) up to the cluster width — raises average fill from ~40%
    # to ~95%, so the visit kernel's fixed-width triangle tests do useful
    # work on nearly every lane.  AABBs are unions of merged cuts; DFS
    # locality keeps them tight.
    def _area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    ranges = []  # (lo, hi, aabb_min, aabb_max)
    for i in cut_nodes:
        if ranges and (hi[i] - ranges[-1][0]) <= cluster_size:
            plo, phi, pmn, pmx = ranges[-1]
            mmn = np.minimum(pmn, bvh.aabb_min[i])
            mmx = np.maximum(pmx, bvh.aabb_max[i])
            # Only merge when the union box stays tight — a loose union makes
            # every nearby packet visit the cluster, costing more than the
            # fill it saves.  (Measured: unconditional merging regresses ~25%.)
            if _area(mmn, mmx) <= 1.05 * (_area(pmn, pmx) + _area(bvh.aabb_min[i], bvh.aabb_max[i])):
                ranges[-1] = (plo, hi[i], mmn, mmx)
                continue
        ranges.append((lo[i], hi[i], bvh.aabb_min[i].copy(), bvh.aabb_max[i].copy()))

    c = len(ranges)
    k = cluster_size
    cmin = np.stack([r[2] for r in ranges])
    cmax = np.stack([r[3] for r in ranges])
    start = np.array([r[0] for r in ranges], np.int32)
    cnt = np.array([r[1] - r[0] for r in ranges], np.int32)
    p0 = np.zeros((c, k, 3), np.float32)
    e1 = np.zeros((c, k, 3), np.float32)
    e2 = np.zeros((c, k, 3), np.float32)
    for ci, (s, e, _, _) in enumerate(ranges):
        s, e = int(s), int(e)
        p0[ci, : e - s] = tri_p0[s:e]
        e1[ci, : e - s] = tri_e1[s:e]
        e2[ci, : e - s] = tri_e2[s:e]
    # Component-major (C, 16, K): rows 0-8 are p0/e1/e2 components, rows 9-15
    # zero padding (DMA slices must be 8-row aligned on TPU); per-axis slices
    # keep triangles in VPU lanes.
    tris = np.concatenate(
        [
            p0.transpose(0, 2, 1),
            e1.transpose(0, 2, 1),
            e2.transpose(0, 2, 1),
            np.zeros((c, 7, k), np.float32),
        ],
        axis=1,
    )
    return ClusterData(
        aabb_min=jnp.asarray(cmin),
        aabb_max=jnp.asarray(cmax),
        start=jnp.asarray(start),
        count=jnp.asarray(cnt),
        tris=jnp.asarray(np.ascontiguousarray(tris)),
    )


def intersect_clusters(
    origin,
    direction,
    cl: ClusterData,
    t_min=T_MIN,
    t_max=T_MAX,
    active=None,
    any_hit: bool = False,
    packet: int = PACKET_SIZE,
    use_pallas: bool | None = None,
) -> Hit:
    """Closest-hit intersection of a ray wavefront against the cluster set.

    `t_max` may be a scalar or a per-ray (N,) array — shadow rays pass the
    distance to their light sample so any_hit queries stop short of it."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    n_orig = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    t_max_hi = float(T_MAX)
    pad = (-n_orig) % packet
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, jnp.float32)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        tmax_arr = jnp.concatenate([tmax_arr, jnp.full(pad, t_min, jnp.float32)])
        if active is not None:
            active = jnp.concatenate([active, jnp.zeros(pad, bool)])
    n = origin.shape[0]
    n_pk = n // packet
    c = cl.n_clusters
    k = cl.p0.shape[2]

    if active is None:
        active = jnp.ones(n, bool)

    inv_d = jnp.where(jnp.abs(direction) > 1e-20, 1.0 / direction, jnp.float32(1e20))

    # ---- Phase 1: cull — conservative packet-bundle vs cluster AABBs -----
    # Interval-arithmetic slab test of the whole 128-ray bundle against every
    # cluster: O(P*C) instead of O(N*C).  The computed entry is a lower bound
    # of every member ray's true entry, so front-to-back pruning in the visit
    # kernel stays exact; incoherent bundles (mixed direction signs) simply
    # degrade to unbounded intervals and rely on the kernel's cap pruning.
    o_p = origin.reshape(n_pk, packet, 3)
    d_p_full = direction.reshape(n_pk, packet, 3)
    act_p = active.reshape(n_pk, packet)

    c_padded = -(-c // CULL_CHUNK) * CULL_CHUNK
    cmin_pad = jnp.concatenate(
        [cl.aabb_min, jnp.full((c_padded - c, 3), 3e9, jnp.float32)]
    ).T  # (3, Cp)
    cmax_pad = jnp.concatenate(
        [cl.aabb_max, jnp.full((c_padded - c, 3), 3e9, jnp.float32)]
    ).T

    BIG = jnp.float32(1e30)
    a3 = act_p[:, :, None]
    o_lo = jnp.min(jnp.where(a3, o_p, BIG), axis=1)  # (P, 3)
    o_hi = jnp.max(jnp.where(a3, o_p, -BIG), axis=1)
    d_lo = jnp.min(jnp.where(a3, d_p_full, BIG), axis=1)
    d_hi = jnp.max(jnp.where(a3, d_p_full, -BIG), axis=1)
    any_act = jnp.any(act_p, axis=1)  # (P,)

    # Reciprocal interval per axis; mixed-sign bundles become unbounded.
    pos = d_lo > 1e-20
    neg = d_hi < -1e-20
    same_sign = pos | neg
    i_lo = jnp.where(same_sign, 1.0 / jnp.where(same_sign, d_hi, 1.0), -BIG)
    i_hi = jnp.where(same_sign, 1.0 / jnp.where(same_sign, d_lo, 1.0), BIG)

    def interval_mul(alo, ahi, blo, bhi):
        p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    tn_lo = jnp.full((n_pk, c_padded), -BIG, jnp.float32)
    tf_hi = jnp.full((n_pk, c_padded), BIG, jnp.float32)
    for ax in range(3):
        b_lo = cmin_pad[ax][None, :]  # (1, Cp)
        b_hi = cmax_pad[ax][None, :]
        a_lo0 = b_lo - o_hi[:, ax : ax + 1]
        a_hi0 = b_lo - o_lo[:, ax : ax + 1]
        a_lo1 = b_hi - o_hi[:, ax : ax + 1]
        a_hi1 = b_hi - o_lo[:, ax : ax + 1]
        t0_lo, t0_hi = interval_mul(a_lo0, a_hi0, i_lo[:, ax : ax + 1], i_hi[:, ax : ax + 1])
        t1_lo, t1_hi = interval_mul(a_lo1, a_hi1, i_lo[:, ax : ax + 1], i_hi[:, ax : ax + 1])
        near_lo = jnp.minimum(t0_lo, t1_lo)
        far_hi = jnp.maximum(t0_hi, t1_hi)
        tn_lo = jnp.maximum(tn_lo, near_lo)
        tf_hi = jnp.minimum(tf_hi, far_hi)

    real_cluster = (jnp.arange(c_padded) < c)[None, :]
    tmax_pk = jnp.max(jnp.where(act_p, tmax_arr.reshape(n_pk, packet), 0.0), axis=1)
    may_hit = (
        (tn_lo <= tf_hi) & (tf_hi >= t_min) & (tn_lo < tmax_pk[:, None])
        & any_act[:, None] & real_cluster
    )
    entry = jnp.where(may_hit, jnp.maximum(tn_lo, t_min), jnp.inf)  # (P, Cp)

    # ---- Phase 2: visit loop ---------------------------------------------
    # Sort each packet's clusters by entry distance once, then march through
    # the sorted list (front-to-back ordering makes the best-hit cap prune
    # the tail early).
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)  # (P, Cp)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)

    if use_pallas:
        from vpt_tpu.accel.visit_kernel import visit_pallas

        d_p = direction.reshape(n_pk, packet, 3)
        aabbs = jnp.concatenate([cl.aabb_min, cl.aabb_max], axis=1)  # (C, 6)
        bt, btri, bu, bv = visit_pallas(
            order, entry_sorted, o_p, d_p, act_p,
            tmax_arr.reshape(n_pk, packet),
            aabbs,
            cl.count, cl.start, cl.tris,
            any_hit=any_hit, t_min=float(t_min), t_max=t_max_hi,
        )
        best_t = bt.reshape(n)
        best_tri = btri.reshape(n)
        best_u = bu.reshape(n)
        best_v = bv.reshape(n)
        found = best_tri >= 0
        hit = Hit(
            t=jnp.where(found, best_t, -1.0),
            tri=best_tri,
            u=best_u,
            v=best_v,
        )
        if pad:
            hit = Hit(
                t=hit.t[:n_orig], tri=hit.tri[:n_orig], u=hit.u[:n_orig], v=hit.v[:n_orig]
            )
        return hit

    V = VISITS_PER_STEP
    # Pad the sorted tables so the last dynamic_slice window is in range.
    pad_cols = (-c_padded) % V + V
    order = jnp.concatenate([order, jnp.zeros((n_pk, pad_cols), jnp.int32)], axis=1)
    entry_sorted = jnp.concatenate(
        [entry_sorted, jnp.full((n_pk, pad_cols), jnp.inf, jnp.float32)], axis=1
    )

    d_p = direction.reshape(n_pk, packet, 3)
    rows = jnp.arange(n_pk)
    offs = jnp.arange(k, dtype=jnp.int32)

    init = (
        jnp.int32(0),  # window index
        tmax_arr,  # best_t starts at the per-ray max distance
        jnp.full(n, -1, jnp.int32),  # best_tri
        jnp.zeros(n, jnp.float32),  # u
        jnp.zeros(n, jnp.float32),  # v
        jnp.bool_(True),
    )

    def cond(carry):
        return carry[5]

    def body(carry):
        w, best_t, best_tri, best_u, best_v, _ = carry
        cids = jax.lax.dynamic_slice(order, (0, w * V), (n_pk, V))  # (P, V)
        t_ent = jax.lax.dynamic_slice(entry_sorted, (0, w * V), (n_pk, V))
        bt_p = best_t.reshape(n_pk, packet)
        if any_hit:
            # Rays that already found any hit stop contributing to the cap.
            no_hit_yet = (best_tri.reshape(n_pk, packet) < 0) & act_p
            cap = jnp.max(jnp.where(no_hit_yet, bt_p, 0.0), axis=1)
        else:
            cap = jnp.max(jnp.where(act_p, bt_p, 0.0), axis=1)
        do = (t_ent < cap[:, None]) & jnp.isfinite(t_ent)  # (P, V)

        cidx = jnp.where(do, cids, 0)
        blk_p0 = cl.p0[cidx]  # (P, V, 3, K)
        blk_e1 = cl.e1[cidx]
        blk_e2 = cl.e2[cidx]
        cnt = cl.count[cidx]  # (P, V)
        base = cl.start[cidx]

        kv = V * k

        def comp(blk, ax):
            return blk[:, :, ax, :].reshape(n_pk, 1, kv)

        p0x, p0y, p0z = comp(blk_p0, 0), comp(blk_p0, 1), comp(blk_p0, 2)
        e1x, e1y, e1z = comp(blk_e1, 0), comp(blk_e1, 1), comp(blk_e1, 2)
        e2x, e2y, e2z = comp(blk_e2, 0), comp(blk_e2, 1), comp(blk_e2, 2)
        ox, oy, oz = (o_p[:, :, ax : ax + 1] for ax in range(3))
        dx, dy, dz = (d_p[:, :, ax : ax + 1] for ax in range(3))

        # Scalarized Möller–Trumbore over (P, packet, V*K); triangles in lanes.
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        in_range = (offs[None, None, :] < cnt[:, :, None]).reshape(n_pk, 1, kv)
        do_mask = jnp.broadcast_to(do[:, :, None], (n_pk, V, k)).reshape(n_pk, 1, kv)
        valid = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & do_mask
            & in_range
            & (t < bt_p[:, :, None])
            & act_p[:, :, None]
        )
        t_masked = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=2)  # (P, packet)
        pr = rows[:, None]
        pc = jnp.arange(packet)[None, :]
        cand_t = t_masked[pr, pc, j]
        better = jnp.isfinite(cand_t).reshape(n)
        cand_t = cand_t.reshape(n)
        tri_table = (base[:, :, None] + offs[None, None, :]).reshape(n_pk, kv)
        cand_tri = tri_table[pr, j].reshape(n)
        cand_u = u[pr, pc, j].reshape(n)
        cand_v = v[pr, pc, j].reshape(n)

        best_t = jnp.where(better, cand_t, best_t)
        best_tri = jnp.where(better, cand_tri, best_tri)
        best_u = jnp.where(better, cand_u, best_u)
        best_v = jnp.where(better, cand_v, best_v)

        return w + 1, best_t, best_tri, best_u, best_v, jnp.any(do)

    _, best_t, best_tri, best_u, best_v, _ = jax.lax.while_loop(cond, body, init)

    found = best_tri >= 0
    hit = Hit(
        t=jnp.where(found, best_t, -1.0),
        tri=best_tri,
        u=best_u,
        v=best_v,
    )
    if pad:
        hit = Hit(t=hit.t[:n_orig], tri=hit.tri[:n_orig], u=hit.u[:n_orig], v=hit.v[:n_orig])
    return hit
