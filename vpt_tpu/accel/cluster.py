"""Cluster-culled intersection — the TPU-native "RT core".

Per-ray BVH traversal is gather-bound on TPU (measured ~6000x slower than
XLA's fused brute force).  Instead we cut the SAH BVH into *clusters* of up
to K contiguous triangles (subtree cuts, so each cluster is one dense slice
of the DFS-reordered triangle arrays) and intersect with a two-phase
wavefront scheme built from operations TPUs are good at:

1. **Regroup** (sort_rays) — rays are sorted by their two nearest entered
   cluster ids (one fused per-ray slab pass + a payload-carrying lax.sort),
   so rays needing triangle tests in the same cluster share packets no
   matter how incoherent their origins/directions are.
2. **Cull** — an exact per-ray slab test of every (ray, cluster) pair,
   fused by XLA straight into per-packet reductions: compacted, entry-
   sorted candidate lists with true counts.
3. **Visit** — each packet marches its candidate list in the Pallas kernel
   (vpt_tpu.accel.visit_kernel): one streaming cluster DMA per visit with
   the next candidate prefetched, per-sub-block AABB skips, and a
   (K/8 tris x 128 rays) Möller–Trumbore block per surviving sub-block,
   stopping when the next candidate starts beyond every live ray's best
   hit.  A pure-XLA visit loop below serves as the CPU/test fallback.

This replaces both the hardware BVH (PathTracer.cpp:433-502) and
TraceRay/RayQuery (RTCommon.slang:47-117).  Ordering/earliest-hit semantics
match closest-hit queries exactly; `any_hit` is the shadow-query shortcut.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.accel.bvh import FlatBVH
from vpt_tpu.accel.traverse import Hit, T_MAX, T_MIN
from vpt_tpu.accel.visit_kernel import GROUP_SIZE

# Tris per cluster.  Re-swept round 5 on the post-platform-change Mosaic
# (PERF.md): the r4 optimum K=256 flipped to K=128 — the new compiler made
# the dense masked Möller-Trumbore blocks the dominant cost (~300 of a
# 444 ms bounce trace at K=256), so halving the tris tested per entering
# row wins despite more clusters/DMAs: colonnade bounce trace 444 -> 231
# ms, full dispatch 11.9 -> 1.92 s (0.38 -> 2.33 M segs/s end-to-end).
CLUSTER_SIZE = int(os.environ.get("VPT_CLUSTER_SIZE", "128"))
_SORT_KEY = os.environ.get("VPT_SORT_KEY", "fs")  # fs=first+second, fe=first+entry
# Rays per packet.  Swept on the colonnade bench at K=256 (PERF.md):
# 128 -> 0.80, 256 -> 0.95, 512 -> 1.06, 1024 -> 0.44 M segs/s — wider
# packets amortize the per-visit orchestration until the candidate union
# (and VMEM row pressure) wins at 1024.
PACKET_SIZE = int(os.environ.get("VPT_PACKET_SIZE", "512"))
GROUPS_PER_STEP = 1  # groups each packet processes per fallback loop step


class ClusterData(NamedTuple):
    """Two-level (group → cluster) acceleration tables with instancing.

    This is the TLAS/BLAS re-expression (PathTracer.cpp:433-502): `tris` /
    `tris_rk` hold one block set per UNIQUE mesh (the BLAS), built in mesh-
    local space; the per-cluster tables are per INSTANCE-cluster (the TLAS),
    with world AABBs and a per-instance world→local transform the kernel
    applies to rays before triangle tests (t stays world-parametric because
    the local direction is left unnormalized).  The flattened single-
    instance path is the special case n_inst=1, identity transform.
    """

    aabb_min: jnp.ndarray  # (C, 3) world cluster boxes (padded entries inverted)
    aabb_max: jnp.ndarray  # (C, 3)
    aabbs: jnp.ndarray  # (C, 6) f32 [min.xyz, max.xyz] — kernel SMEM table
    group_min: jnp.ndarray  # (G, 3) — group = GROUP_SIZE consecutive clusters
    group_max: jnp.ndarray  # (G, 3)
    start: jnp.ndarray  # (C,) i32 — VIRTUAL triangle-id base of the cluster
    count: jnp.ndarray  # (C,) i32 — triangles in the cluster (<= K)
    block_id: jnp.ndarray  # (C,) i32 — row of tris/tris_rk holding the
    # cluster's (mesh-local) triangle block; instances of one mesh share rows
    group_blk0: jnp.ndarray  # (G,) i32 — block row of each group's FIRST
    # real member.  A group's real members occupy CONSECUTIVE tris_rk rows
    # starting there (slot m ↔ row group_blk0+m; padded slots trail), so the
    # stream kernel fetches a whole candidate group with ONE async copy of
    # GROUP_SIZE blocks instead of up to GROUP_SIZE start+wait latencies.
    # tris_rk carries GROUP_SIZE-1 trailing zero blocks so the fixed-size
    # copy never overruns.
    inst: jnp.ndarray  # (C,) i32 — owning instance (transform table row)
    inv_rows: jnp.ndarray  # (n_inst, 12) f32 — world→local affine per
    # instance, row-major [R00 R01 R02 T0  R10 R11 R12 T1  R20 R21 R22 T2]
    tris: jnp.ndarray  # (B, 16, K) dense mesh-local blocks: rows 0-8 =
    # [p0.xyz, e1.xyz, e2.xyz], rows 9-15 padding (8-row DMA alignment).
    # Component-major; used by the XLA fallback visit loop (CPU tests) only.
    tris_rk: jnp.ndarray  # (B, K/8 + 8, 128) kernel blocks, sub-block
    # interleaved: [b, k, s*16 + j] = component j (0..8 = p0.xyz, e1.xyz,
    # e2.xyz; 9..15 pad) of triangle s*(K/8) + k, for k < K/8.  Triangle
    # index sits in SUBLANES and the 8 sub-blocks share the 128 lanes, so
    # the Pallas kernel slices component columns (K/8, 1) per sub-block,
    # broadcasts rays along LANES as (1, pk) single-vreg rows, and skips
    # whole sub-blocks whose sub-AABB no ray enters.  Rows K/8..K/8+7 are a
    # metadata tile riding the same DMA: row K/8+s lanes 0..5 hold
    # sub-block s's mesh-local [lo.xyz, hi.xyz].

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


class MeshClusters(NamedTuple):
    """Host-side per-mesh (BLAS) cluster set in mesh-local space."""

    cmin: np.ndarray  # (Cm, 3) local cluster AABBs
    cmax: np.ndarray  # (Cm, 3)
    start: np.ndarray  # (Cm,) i32 local reordered-slot base
    count: np.ndarray  # (Cm,) i32
    tris: np.ndarray  # (Cm, 16, K) fallback blocks (local)
    tris_rk: np.ndarray  # (Cm, K/8 + 8, 128) kernel blocks (local)
    gidx: np.ndarray  # (Cm,) i32 — group (BVH subtree) index; clusters of
    # one group are DFS-contiguous and assemble_clusters pads each
    # (instance, group) to exactly GROUP_SIZE slots


def _subtree_lohi(bvh: FlatBVH):
    """Subtree triangle ranges [lo, hi): reverse-index sweep (children have
    larger indices in DFS pre-order; right child of inner i is skip[i+1])."""
    n_nodes = bvh.n_nodes
    count = bvh.tri_count
    first = bvh.first_tri
    skip = bvh.skip
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
    return lo, hi


def _subtree_cuts(bvh: FlatBVH, root: int, max_tris: int, lo, hi):
    """DFS-ordered subtree nodes under `root` with <= max_tris each."""
    out = []
    stack = [root]
    while stack:
        i = stack.pop()
        if hi[i] - lo[i] <= max_tris:
            out.append(i)
        else:
            stack.append(i + 1)
            stack.append(bvh.skip[i + 1])
    out.sort(key=lambda i: lo[i])
    return out


def _cut_ranges(bvh: FlatBVH, cluster_size: int, group_size: int = GROUP_SIZE):
    """Two-level cut: the BVH is first cut into GROUP subtrees of
    <= group_size*cluster_size triangles, then each group subtree into
    clusters of <= cluster_size (greedily merged).  Returns a list of
    groups, each a list of (lo, hi, aabb_min, aabb_max) with at most
    group_size entries — so every group's member clusters share one BVH
    subtree and the group AABB (union of members) stays tight.  (The
    previous single-level cut let groups straddle arbitrary subtree — and,
    instanced, instance — boundaries; their union boxes were the dominant
    source of spurious (ray, group) incidences in the stream cull.)"""
    lo, hi = _subtree_lohi(bvh)

    # Only merge when the union box stays tight — a loose union makes
    # every nearby packet visit the cluster, costing more than the
    # fill it saves.  (Measured: unconditional merging regresses ~25%.)
    def _area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    groups = []
    for gnode in _subtree_cuts(bvh, 0, cluster_size * group_size, lo, hi):
        ranges = []  # (lo, hi, aabb_min, aabb_max) within this group subtree
        for i in _subtree_cuts(bvh, gnode, cluster_size, lo, hi):
            if ranges and (hi[i] - ranges[-1][0]) <= cluster_size:
                plo, phi, pmn, pmx = ranges[-1]
                mmn = np.minimum(pmn, bvh.aabb_min[i])
                mmx = np.maximum(pmx, bvh.aabb_max[i])
                if _area(mmn, mmx) <= 1.05 * (
                    _area(pmn, pmx) + _area(bvh.aabb_min[i], bvh.aabb_max[i])
                ):
                    ranges[-1] = (plo, hi[i], mmn, mmx)
                    continue
            ranges.append((lo[i], hi[i], bvh.aabb_min[i].copy(), bvh.aabb_max[i].copy()))
        # A group subtree can exceed group_size clusters when merging fails
        # (skinny cuts); chunk it — chunks still share the subtree.
        for s in range(0, len(ranges), group_size):
            groups.append(ranges[s : s + group_size])
    return groups


def build_mesh_clusters(
    bvh: FlatBVH, tri_p0: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray,
    cluster_size: int = CLUSTER_SIZE,
) -> MeshClusters:
    """Per-mesh BLAS: cluster blocks over the *reordered* local triangle
    arrays (bvh.tri_order applied by the caller)."""
    groups = _cut_ranges(bvh, cluster_size)
    ranges = [r for grp in groups for r in grp]
    gidx = np.array(
        [gi for gi, grp in enumerate(groups) for _ in grp], np.int32
    )
    c = len(ranges)
    k = cluster_size
    BIG = 3e9
    cmin = np.stack([r[2] for r in ranges]).astype(np.float32)
    cmax = np.stack([r[3] for r in ranges]).astype(np.float32)
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

    # Sub-block interleaved kernel blocks with the sub-AABB metadata tile
    # appended as rows sub..sub+7 (see ClusterData.tris_rk).
    n_sub = 8
    assert k % n_sub == 0, "cluster_size must be a multiple of 8"
    sub = k // n_sub
    comps = np.concatenate([p0, e1, e2], axis=2)  # (c, k, 9)
    tris_rk = np.zeros((c, sub + n_sub, 128), np.float32)
    v1 = p0 + e1
    v2 = p0 + e2
    fill = np.arange(k)[None, :] < cnt[:, None]  # (c, k) real-triangle mask
    for s in range(n_sub):
        sl = slice(s * sub, (s + 1) * sub)
        tris_rk[:, :sub, s * 16 : s * 16 + 9] = comps[:, sl]
        f = fill[:, sl][:, :, None]  # (c, sub, 1)
        lo = np.minimum(np.minimum(np.where(f, p0[:, sl], BIG), np.where(f, v1[:, sl], BIG)),
                        np.where(f, v2[:, sl], BIG)).min(axis=1)
        hi = np.maximum(np.maximum(np.where(f, p0[:, sl], -BIG), np.where(f, v1[:, sl], -BIG)),
                        np.where(f, v2[:, sl], -BIG)).max(axis=1)
        empty = ~fill[:, sl].any(axis=1)
        lo[empty] = BIG
        hi[empty] = -BIG
        tris_rk[:, sub + s, 0:3] = lo
        tris_rk[:, sub + s, 3:6] = hi

    return MeshClusters(
        cmin=cmin, cmax=cmax, start=start, count=cnt,
        tris=np.ascontiguousarray(tris), tris_rk=np.ascontiguousarray(tris_rk),
        gidx=gidx,
    )


def _transform_aabb(lo, hi, m):
    """World AABB of a transformed local box (8 corners through affine m)."""
    corners = np.array(
        [
            [x, y, z]
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ],
        np.float64,
    )
    w = corners @ m[:3, :3].T + m[:3, 3]
    return w.min(axis=0).astype(np.float32), w.max(axis=0).astype(np.float32)


def assemble_clusters(
    mesh_clusters: list[MeshClusters],
    instance_specs: list[tuple[int, np.ndarray, int]],
) -> ClusterData:
    """TLAS assembly: per-instance cluster tables over shared mesh blocks.

    `instance_specs` is [(mesh_cluster_index, transform(4,4), virt_tri_base)]
    — virt_tri_base is the instance's base in the virtual (per-instance)
    triangle-id space that shading tables are indexed by.
    """
    block_base = []
    b = 0
    for mc in mesh_clusters:
        block_base.append(b)
        b += mc.cmin.shape[0]

    # Every (instance, mesh-group) becomes exactly GROUP_SIZE consecutive
    # cluster slots (empty pad slots: inverted AABB, zero count — the kernel
    # skips them at its cnt>0 check) so group g = clusters
    # [g*GROUP_SIZE, (g+1)*GROUP_SIZE) with no indirection tables, groups
    # never span instances, and each group's members share one BVH subtree
    # (tight union box).
    BIG = 3e9
    cmin_l, cmax_l, start_l, cnt_l, blk_l, inst_l, inv_l = [], [], [], [], [], [], []

    def _pad_group():
        fill = (-len(cmin_l)) % GROUP_SIZE
        for _ in range(fill):
            cmin_l.append(np.full(3, BIG, np.float32))
            cmax_l.append(np.full(3, -BIG, np.float32))
            start_l.append(0)
            cnt_l.append(0)
            blk_l.append(0)
            inst_l.append(inst_l[-1] if inst_l else 0)

    for ii, (mi, transform, virt_base) in enumerate(instance_specs):
        mc = mesh_clusters[mi]
        m = np.asarray(transform, np.float64)
        inv = np.linalg.inv(m)
        inv_l.append(inv[:3, :4].astype(np.float32).reshape(12))
        prev_g = None
        for c in range(mc.cmin.shape[0]):
            gi = int(mc.gidx[c])
            if prev_g is not None and gi != prev_g:
                _pad_group()
            prev_g = gi
            lo, hi = _transform_aabb(mc.cmin[c], mc.cmax[c], m)
            cmin_l.append(lo)
            cmax_l.append(hi)
            start_l.append(virt_base + int(mc.start[c]))
            cnt_l.append(int(mc.count[c]))
            blk_l.append(block_base[mi] + c)
            inst_l.append(ii)
        _pad_group()

    c = len(cmin_l)
    c_pad = -(-max(c, 1) // GROUP_SIZE) * GROUP_SIZE
    cmin = np.full((c_pad, 3), BIG, np.float32)
    cmax = np.full((c_pad, 3), -BIG, np.float32)
    start = np.zeros(c_pad, np.int32)
    cnt = np.zeros(c_pad, np.int32)
    blk = np.zeros(c_pad, np.int32)
    inst = np.zeros(c_pad, np.int32)
    if c:
        cmin[:c] = np.stack(cmin_l)
        cmax[:c] = np.stack(cmax_l)
        start[:c] = np.asarray(start_l, np.int32)
        cnt[:c] = np.asarray(cnt_l, np.int32)
        blk[:c] = np.asarray(blk_l, np.int32)
        inst[:c] = np.asarray(inst_l, np.int32)

    g = c_pad // GROUP_SIZE
    group_min = cmin.reshape(g, GROUP_SIZE, 3).min(axis=1)
    group_max = cmax.reshape(g, GROUP_SIZE, 3).max(axis=1)

    tris_rk_all = np.concatenate(
        [mc.tris_rk for mc in mesh_clusters]
        + [np.zeros((GROUP_SIZE - 1,) + mesh_clusters[0].tris_rk.shape[1:], np.float32)]
    )
    return ClusterData(
        aabb_min=jnp.asarray(cmin),
        aabb_max=jnp.asarray(cmax),
        aabbs=jnp.asarray(np.concatenate([cmin, cmax], axis=1)),
        group_min=jnp.asarray(group_min),
        group_max=jnp.asarray(group_max),
        start=jnp.asarray(start),
        count=jnp.asarray(cnt),
        block_id=jnp.asarray(blk),
        group_blk0=jnp.asarray(blk[::GROUP_SIZE].copy()),
        inst=jnp.asarray(inst),
        inv_rows=jnp.asarray(np.stack(inv_l)),
        tris=jnp.asarray(np.concatenate([mc.tris for mc in mesh_clusters])),
        tris_rk=jnp.asarray(tris_rk_all),
    )


def build_clusters(
    bvh: FlatBVH, tri_p0: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray,
    cluster_size: int = CLUSTER_SIZE,
) -> ClusterData:
    """Single-instance (flattened world-space) cluster build — the
    special case of assemble_clusters with one identity instance."""
    mc = build_mesh_clusters(bvh, tri_p0, tri_e1, tri_e2, cluster_size)
    return assemble_clusters([mc], [(0, np.eye(4, dtype=np.float32), 0)])


def _slab_tn_tf(o_p, d_p, tmax_p, cmin_pad, cmax_pad, t_min):
    """Per-ray slab intervals vs every cluster box: (P, pk, Cp) tn and tf."""
    n_pk, packet, _ = o_p.shape
    c_padded = cmin_pad.shape[1]
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) > 1e-20, d_p, 1e-20)
    tn = jnp.full((n_pk, packet, c_padded), t_min, jnp.float32)
    tf = jnp.broadcast_to(tmax_p[:, :, None], (n_pk, packet, c_padded))
    for ax in range(3):
        oc = o_p[:, :, ax : ax + 1]
        ic = inv_p[:, :, ax : ax + 1]
        s0 = (cmin_pad[ax][None, None, :] - oc) * ic
        s1 = (cmax_pad[ax][None, None, :] - oc) * ic
        tn = jnp.maximum(tn, jnp.minimum(s0, s1))
        tf = jnp.minimum(tf, jnp.maximum(s0, s1))
    return tn, tf


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
    sort_rays: bool = False,
    interpret: bool = False,
) -> Hit:
    """Closest-hit intersection of a ray wavefront against the cluster set.

    `t_max` may be a scalar or a per-ray (N,) array — shadow rays pass the
    distance to their light sample so any_hit queries stop short of it.

    With `sort_rays` the wavefront is first regrouped by each ray's two
    nearest entered cluster ids: rays that need triangle tests in the same
    cluster share packets REGARDLESS of origin/direction coherence, which is
    what bounds the packet SIMD waste (a morton/octant sort leaves diffuse
    bounce packets visiting ~15 clusters while each ray only enters ~2).
    The permutation is applied by carrying the payload through a
    multi-operand lax.sort and carrying the hit back through a second sort
    on the lane id — per-lane gathers are ~0.25 us/element on TPU."""
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

    # Bound each ray's t_max by its exit from the scene root box: geometry
    # is inside the root, and a line leaves a convex box exactly once, so no
    # hit can lie beyond the exit.  This turns escaping rays' best-t from
    # +inf into a short finite bound, which is what lets the kernel's
    # front-to-back cap terminate packets in open scenes (otherwise one
    # sky-bound diffuse ray forces its packet to march every candidate).
    root_min = jnp.min(cl.group_min, axis=0)
    root_max = jnp.max(cl.group_max, axis=0)
    inv_all = 1.0 / jnp.where(jnp.abs(direction) > 1e-20, direction, 1e-20)
    r0 = (root_min[None, :] - origin) * inv_all
    r1 = (root_max[None, :] - origin) * inv_all
    tn_root = jnp.max(jnp.minimum(r0, r1), axis=1)
    tf_root = jnp.min(jnp.maximum(r0, r1), axis=1)
    exit_bound = jnp.where(
        tn_root <= tf_root, tf_root * 1.0001 + jnp.float32(t_min), jnp.float32(t_min)
    )
    tmax_arr = jnp.minimum(tmax_arr, jnp.maximum(exit_bound, jnp.float32(t_min)))

    # Group-level tables: the XLA cull and sorts work at GROUP granularity
    # (GROUP_SIZE consecutive clusters per group), so their cost scales with
    # C/GROUP_SIZE; the kernel recovers per-cluster exactness with SMEM
    # slab tests before each member's DMA.
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate(
        [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T  # (3, Gp)
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T

    lane_key = None
    if sort_rays:
        tn0, tf0 = _slab_tn_tf(
            origin.reshape(n_pk, packet, 3), direction.reshape(n_pk, packet, 3),
            tmax_arr.reshape(n_pk, packet), gmin_pad, gmax_pad, t_min,
        )
        ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)
        first = jnp.argmin(ent, axis=1).astype(jnp.int32)
        v1 = jnp.min(ent, axis=1)
        sentinel = jnp.int32(g_padded)
        if _SORT_KEY == "fe":
            # first entered group + quantized entry depth: rays that reach
            # the same group at a similar distance likely share the rest of
            # their candidate lists too.
            diag = jnp.linalg.norm(root_max - root_min)
            q = jnp.clip(v1 / jnp.maximum(diag, 1e-20) * 256.0, 0.0, 1023.0)
            first_s = jnp.where(jnp.isfinite(v1), first, sentinel)
            key = first_s * 1024 + jnp.where(jnp.isfinite(v1), q, 0.0).astype(jnp.int32)
        else:
            ids_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
            ent2 = jnp.where(ids_row == first[:, None], jnp.inf, ent)
            second = jnp.argmin(ent2, axis=1).astype(jnp.int32)
            v2 = jnp.min(ent2, axis=1)
            first = jnp.where(jnp.isfinite(v1), first, sentinel)
            second = jnp.where(jnp.isfinite(v2), second, sentinel)
            key = first * (g_padded + 1) + second
        key = jnp.where(active, key, jnp.int32(1 << 30))
        lane = jax.lax.iota(jnp.int32, n)
        (_, lane_key, ox, oy, oz, dx, dy, dz, tmax_arr, active) = jax.lax.sort(
            (key, lane, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             tmax_arr, active),
            num_keys=1, is_stable=True,
        )
        origin = jnp.stack([ox, oy, oz], axis=-1)
        direction = jnp.stack([dx, dy, dz], axis=-1)

    # ---- Phase 1: cull — exact per-ray slab test vs group boxes, fused ----
    # One fused (P, packet, G) slab test reduced straight to per-packet
    # tables: `entry` = nearest entry distance of any live ray into each
    # group box, inf when no ray enters before its own t_max.
    o_p = origin.reshape(n_pk, packet, 3)
    d_p_full = direction.reshape(n_pk, packet, 3)
    act_p = active.reshape(n_pk, packet)
    tmax_p = tmax_arr.reshape(n_pk, packet)

    tn, tf = _slab_tn_tf(o_p, d_p_full, tmax_p, gmin_pad, gmax_pad, t_min)
    enter = (tn <= tf) & act_p[:, :, None]  # (P, pk, Gp)
    entry = jnp.min(jnp.where(enter, tn, jnp.inf), axis=1)  # (P, Gp)
    nvis = jnp.sum(jnp.any(enter, axis=1), axis=1).astype(jnp.int32)  # (P,)

    # ---- Phase 2: visit loop ---------------------------------------------
    # Sort each packet's group candidates by entry distance (multi-operand
    # sort carrying the ids — take_along_axis would be a per-lane gather),
    # then march the compacted prefix front-to-back so the best-hit cap
    # prunes the tail.
    ids = jnp.broadcast_to(
        jnp.arange(g_padded, dtype=jnp.int32)[None, :], (n_pk, g_padded)
    )
    entry_sorted, order = jax.lax.sort((entry, ids), dimension=1, num_keys=1)

    if use_pallas:
        from vpt_tpu.accel.visit_kernel import visit_pallas

        d_p = direction.reshape(n_pk, packet, 3)
        bt, btri, bu, bv = visit_pallas(
            nvis, order, entry_sorted, o_p, d_p, act_p,
            tmax_p,
            cl.aabbs,
            cl.count, cl.start, cl.block_id, cl.inst, cl.inv_rows, cl.tris_rk,
            any_hit=any_hit, t_min=float(t_min), t_max=t_max_hi,
            interpret=interpret,
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
        if lane_key is not None:
            (_, t_u, tri_u, u_u, v_u) = jax.lax.sort(
                (lane_key, hit.t, hit.tri, hit.u, hit.v), num_keys=1, is_stable=True
            )
            hit = Hit(t=t_u, tri=tri_u, u=u_u, v=v_u)
        if pad:
            hit = Hit(
                t=hit.t[:n_orig], tri=hit.tri[:n_orig], u=hit.u[:n_orig], v=hit.v[:n_orig]
            )
        return hit

    V = GROUPS_PER_STEP
    # Pad the sorted tables so the last dynamic_slice window is in range.
    pad_cols = (-g_padded) % V + V
    order = jnp.concatenate([order, jnp.zeros((n_pk, pad_cols), jnp.int32)], axis=1)
    entry_sorted = jnp.concatenate(
        [entry_sorted, jnp.full((n_pk, pad_cols), jnp.inf, jnp.float32)], axis=1
    )

    d_p = direction.reshape(n_pk, packet, 3)
    rows = jnp.arange(n_pk)
    offs = jnp.arange(k, dtype=jnp.int32)
    vc = V * GROUP_SIZE  # clusters per step (V groups expanded)

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
        gids = jax.lax.dynamic_slice(order, (0, w * V), (n_pk, V))  # (P, V)
        t_ent = jax.lax.dynamic_slice(entry_sorted, (0, w * V), (n_pk, V))
        bt_p = best_t.reshape(n_pk, packet)
        if any_hit:
            # Rays that already found any hit stop contributing to the cap.
            no_hit_yet = (best_tri.reshape(n_pk, packet) < 0) & act_p
            cap = jnp.max(jnp.where(no_hit_yet, bt_p, 0.0), axis=1)
        else:
            cap = jnp.max(jnp.where(act_p, bt_p, 0.0), axis=1)
        do = (t_ent < cap[:, None]) & jnp.isfinite(t_ent)  # (P, V)

        # Expand each candidate group to its GROUP_SIZE member clusters.
        cidx = (
            jnp.where(do, gids, 0)[:, :, None] * GROUP_SIZE
            + jnp.arange(GROUP_SIZE, dtype=jnp.int32)[None, None, :]
        ).reshape(n_pk, vc)
        do = jnp.broadcast_to(do[:, :, None], (n_pk, V, GROUP_SIZE)).reshape(n_pk, vc)
        bidx = cl.block_id[cidx]  # (P, Vc) block rows (instancing dedup)
        blk_p0 = cl.p0[bidx]  # (P, Vc, 3, K)
        blk_e1 = cl.e1[bidx]
        blk_e2 = cl.e2[bidx]
        cnt = cl.count[cidx]  # (P, Vc)
        base = cl.start[cidx]

        kv = vc * k

        def comp(blk, ax):
            return blk[:, :, ax, :].reshape(n_pk, 1, kv)

        p0x, p0y, p0z = comp(blk_p0, 0), comp(blk_p0, 1), comp(blk_p0, 2)
        e1x, e1y, e1z = comp(blk_e1, 0), comp(blk_e1, 1), comp(blk_e1, 2)
        e2x, e2y, e2z = comp(blk_e2, 0), comp(blk_e2, 1), comp(blk_e2, 2)
        if cl.inv_rows.shape[0] > 1:
            # Instanced: rays into each cluster's mesh-local space, expanded
            # along the candidate dim: (P, pk, Vc*K) via (P, 1, Vc, 1) T
            # components times (P, pk, 1, 1) world rays (XLA fuses these
            # into the MT reduction; nothing large materializes).
            T = cl.inv_rows[cl.inst[cidx]]  # (P, Vc, 12)

            def trow(j):
                return T[:, None, :, None, j]  # (P, 1, Vc, 1)

            ow = [o_p[:, :, None, None, ax] for ax in range(3)]
            dw = [d_p[:, :, None, None, ax] for ax in range(3)]

            def xform(vecs, translate):
                out = []
                for r in range(3):
                    acc = trow(4 * r) * vecs[0] + trow(4 * r + 1) * vecs[1] + trow(4 * r + 2) * vecs[2]
                    if translate:
                        acc = acc + trow(4 * r + 3)
                    out.append(acc)  # (P, pk, Vc, 1)
                return out

            lo3 = xform(ow, True)
            ld3 = xform(dw, False)
            shape5 = (n_pk, packet, vc, k)

            def expand(a):
                return jnp.broadcast_to(a, shape5).reshape(n_pk, packet, kv)

            ox, oy, oz = (expand(a) for a in lo3)
            dx, dy, dz = (expand(a) for a in ld3)
            p0x = p0x.reshape(n_pk, 1, kv); p0y = p0y.reshape(n_pk, 1, kv); p0z = p0z.reshape(n_pk, 1, kv)
        else:
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
        do_mask = jnp.broadcast_to(do[:, :, None], (n_pk, vc, k)).reshape(n_pk, 1, kv)
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
    if lane_key is not None:
        (_, t_u, tri_u, u_u, v_u) = jax.lax.sort(
            (lane_key, hit.t, hit.tri, hit.u, hit.v), num_keys=1, is_stable=True
        )
        hit = Hit(t=t_u, tri=tri_u, u=u_u, v=v_u)
    if pad:
        hit = Hit(t=hit.t[:n_orig], tri=hit.tri[:n_orig], u=hit.u[:n_orig], v=hit.v[:n_orig])
    return hit
