"""Pallas TPU kernel for the cluster visit phase (two-level: group → cluster).

Replaces TraceRay / RayQuery hardware traversal (RTCommon.slang:47-117).
Each 128-ray packet is one grid program.  The XLA-side cull works at GROUP
granularity (GROUP_SIZE=8 DFS-adjacent clusters per group) so its cost and
sort widths scale with C/8; the kernel marches the packet's entry-sorted
group candidates and recovers per-cluster exactness with cheap in-kernel
slab tests:

  for each candidate group (until next entry > every live ray's best hit):
    for each of its 8 member clusters:
      SMEM world-AABB slab test (~22 vector issues) — skip if no live ray
      enters; otherwise DMA the cluster block and run sub-block tests + MT.

Layout (the part that makes it fast):

* Rays live in LANES: every per-ray quantity (origins, directions, best-t,
  masks) is a (1, 128) single-vreg row, so the bookkeeping around each
  visit costs ~1 vector issue per op instead of 16.
* Triangles live in SUBLANES, 8 sub-blocks of K/8 triangles interleaved
  across the 128 lanes of the storage block (ClusterData.tris_rk): component
  j of sub-block s is the (K/8, 1) column s*16+j.  The Möller-Trumbore
  block for one sub-block is (K/8, 128) — triangle index broadcasts down
  sublanes, rays across lanes, both operands broadcast naturally.
* Sub-block AABBs ride the SAME DMA as the triangles (rows K/8..K/8+7 of
  the block, lanes 0..5 = lo.xyz/hi.xyz) instead of SMEM, so per-cluster
  SMEM stays at 8 floats (world AABB + cnt + base) and Sponza-scale cluster
  counts fit.  The slab test reads them as (1, 1) static slices that
  broadcast against the (1, 128) ray rows — no scalar extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

N_SUB = 8  # sub-blocks per cluster

# Clusters per group (build_clusters pads to an exact multiple).  Bigger
# groups halve every XLA-side (N, G) cull pass and table at the cost of
# looser group AABBs (more in-kernel member screening) — env-tunable for
# on-chip sweeps.
GROUP_SIZE = int(_os.environ.get("VPT_GROUP_SIZE", "8"))


def _visit_kernel(
    any_hit: bool,
    t_min: float,
    t_max: float,
    n_sub_rows: int,
    instanced: bool,
    nv_ref,  # (1, 1, 1) i32 SMEM — number of candidate groups for this packet
    order_ref,  # (1, 1, Gp) i32 SMEM — this packet's groups, entry-sorted
    entry_ref,  # (1, 1, Gp) f32 SMEM — sorted entry distances (inf-padded)
    ox_ref, oy_ref, oz_ref,  # (1, 1, pk) f32 ray origins
    dx_ref, dy_ref, dz_ref,  # (1, 1, pk) f32 ray directions
    act_ref,  # (1, 1, pk) i32
    tmax_ref,  # (1, 1, pk) f32 — per-ray max distance (shadow rays stop short)
    cab_ref,  # (1, 6C) f32 SMEM — per-cluster world AABB [c*6: min.xyz, max.xyz]
    cnt_ref,  # (1, C) i32 SMEM — per-cluster triangle counts
    base_ref,  # (1, C) i32 SMEM — per-cluster VIRTUAL triangle-id base
    blk_ref,  # (1, C) i32 SMEM — per-cluster block row in tris_ref
    inst_ref,  # (1, C) i32 SMEM — per-cluster instance id
    inv_ref,  # (1, 12*n_inst) f32 SMEM — world->local affines (instancing)
    tris_ref,  # (B, K/8 + 8, 128) f32 HBM — manual DMA (ClusterData.tris_rk)
    t_out,  # (1, 1, pk) f32
    tri_out,  # (1, 1, pk) i32
    u_out,  # (1, 1, pk) f32
    v_out,  # (1, 1, pk) f32
    buf,  # (2, K/8 + 8, 128) f32 VMEM scratch
    sem,  # (2,) DMA semaphores
    pend,  # (2,) i32 SMEM scratch: [pending cluster id (-1 = none), its slot]
):
    pk = ox_ref.shape[2]
    sub = n_sub_rows  # triangles per sub-block = K / N_SUB

    t_out[...] = tmax_ref[...]
    tri_out[...] = jnp.full((1, 1, pk), -1, jnp.int32)
    u_out[...] = jnp.zeros((1, 1, pk), jnp.float32)
    v_out[...] = jnp.zeros((1, 1, pk), jnp.float32)

    nv = nv_ref[0, 0, 0]

    # Per-ray rows (1, pk) — one vreg each.
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0] > 0
    inv_x = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    inv_y = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    inv_z = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, pk), 0)

    def live_row():
        if any_hit:
            return act & (tri_out[0] < 0)
        return act

    def _mt_sub(s, blk, live, cnt, base, o3, d3):
        """Möller-Trumbore on sub-block s: (sub, pk), triangles x rays.
        `o3`/`d3` are the (1, pk) ray rows in the BLOCK's (mesh-local)
        space; t stays world-parametric because d3 is unnormalized."""
        c0 = s * 16
        rox, roy, roz = o3
        rdx, rdy, rdz = d3

        def col(j):
            return blk[0:sub, c0 + j : c0 + j + 1]  # (sub, 1)

        p0x, p0y, p0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)

        pvx = rdy * e2z - rdz * e2y
        pvy = rdz * e2x - rdx * e2z
        pvz = rdx * e2y - rdy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = rox - p0x
        tvy = roy - p0y
        tvz = roz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        bt = t_out[0]  # (1, pk)
        tri_idx = idx0 + s * sub  # within-cluster triangle index
        valid = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < bt)
            & (tri_idx < cnt)
            & live
        )
        t_masked = jnp.where(valid, t, jnp.inf)
        t_best = jnp.min(t_masked, axis=0, keepdims=True)  # (1, pk)
        # argmin down sublanes with smallest-index tie-break (matches the
        # whole-cluster argmin of the reference ordering: earlier sub-blocks
        # merge first and later ones only win strictly-closer hits).
        j = jnp.min(jnp.where(t_masked == t_best, idx0, sub), axis=0, keepdims=True)
        pick = idx0 == j
        u_best = jnp.sum(jnp.where(pick, u, 0.0), axis=0, keepdims=True)
        v_best = jnp.sum(jnp.where(pick, v, 0.0), axis=0, keepdims=True)

        better = t_best < bt
        t_out[...] = jnp.where(better, t_best, bt).reshape(1, 1, pk)
        tri_out[...] = jnp.where(
            better, base + s * sub + j, tri_out[0]
        ).reshape(1, 1, pk)
        u_out[...] = jnp.where(better, u_best, u_out[0]).reshape(1, 1, pk)
        v_out[...] = jnp.where(better, v_best, v_out[0]).reshape(1, 1, pk)

    def _slab_smem(cid, tf):
        """World-AABB slab test from SMEM for cluster `cid` vs all rays."""
        tn = jnp.full((1, pk), t_min, jnp.float32)
        o6 = 6 * cid
        for ax, (oc, ic) in enumerate(((ox, inv_x), (oy, inv_y), (oz, inv_z))):
            s0 = (cab_ref[0, o6 + ax] - oc) * ic
            s1 = (cab_ref[0, o6 + 3 + ax] - oc) * ic
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return tn <= tf

    def _mt_cluster(cid, slot):
        """Intersect the cluster whose block sits in buf[slot]."""
        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]
        blk = buf[slot]
        meta = buf[slot, sub : sub + N_SUB]  # (8, 128): row s lanes 0:6 = AABB

        # Instancing: transform rays world->local for this cluster's
        # instance (blocks and sub-AABBs are mesh-local).  The local
        # direction stays unnormalized so t remains world-parametric and
        # best-t merging across instances is exact.  ~40 vector issues.
        if instanced:
            i12 = inst_ref[0, cid] * 12
            T = [inv_ref[0, i12 + j] for j in range(12)]
            lox = T[0] * ox + T[1] * oy + T[2] * oz + T[3]
            loy = T[4] * ox + T[5] * oy + T[6] * oz + T[7]
            loz = T[8] * ox + T[9] * oy + T[10] * oz + T[11]
            ldx = T[0] * dx + T[1] * dy + T[2] * dz
            ldy = T[4] * dx + T[5] * dy + T[6] * dz
            ldz = T[8] * dx + T[9] * dy + T[10] * dz
            linv_x = 1.0 / jnp.where(jnp.abs(ldx) > 1e-20, ldx, 1e-20)
            linv_y = 1.0 / jnp.where(jnp.abs(ldy) > 1e-20, ldy, 1e-20)
            linv_z = 1.0 / jnp.where(jnp.abs(ldz) > 1e-20, ldz, 1e-20)
        else:
            lox, loy, loz = ox, oy, oz
            ldx, ldy, ldz = dx, dy, dz
            linv_x, linv_y, linv_z = inv_x, inv_y, inv_z

        # Sub-block slab tests from the DMA'd metadata rows: (1,1) slices
        # broadcast against (1, pk) ray rows — pure vector math.
        for s in range(N_SUB):
            live_s = live_row()
            tn = jnp.full((1, pk), t_min, jnp.float32)
            tf = t_out[0]
            for ax, (oc, ic) in enumerate(
                ((lox, linv_x), (loy, linv_y), (loz, linv_z))
            ):
                lo = meta[s : s + 1, ax : ax + 1]
                hi = meta[s : s + 1, 3 + ax : 4 + ax]
                s0 = (lo - oc) * ic
                s1 = (hi - oc) * ic
                tn = jnp.maximum(tn, jnp.minimum(s0, s1))
                tf = jnp.minimum(tf, jnp.maximum(s0, s1))
            enter = (tn <= tf) & live_s

            @pl.when(jnp.any(enter))
            def _do_sub(s=s, enter=enter, cnt=cnt, base=base):
                _mt_sub(s, blk, enter, cnt, base,
                        (lox, loy, loz), (ldx, ldy, ldz))

    pend[0] = jnp.int32(-1)  # cluster id whose DMA is in flight
    pend[1] = jnp.int32(0)  # its buffer slot

    # Software pipeline over the stream of entered member clusters (crossing
    # group boundaries and while-loop iterations): when member `cid` passes
    # its pre-test, the PREVIOUS entered cluster's DMA is waited, `cid`'s
    # DMA starts into the other slot, and the previous cluster's triangle
    # math runs — exactly one DMA in flight at any time (two outstanding
    # per kernel instance aborts the TPU runtime), always overlapped with
    # the prior cluster's MT blocks.
    def _enqueue(cid):
        prev = pend[0]
        prev_slot = pend[1]

        @pl.when(prev >= 0)
        def _overlap():
            slot = 1 - prev_slot
            pltpu.make_async_copy(
                tris_ref.at[blk_ref[0, prev]], buf.at[prev_slot], sem.at[prev_slot]
            ).wait()
            pltpu.make_async_copy(
                tris_ref.at[blk_ref[0, cid]], buf.at[slot], sem.at[slot]
            ).start()
            pend[0] = cid
            pend[1] = slot
            _mt_cluster(prev, prev_slot)

        @pl.when(prev < 0)
        def _first():
            pltpu.make_async_copy(
                tris_ref.at[blk_ref[0, cid]], buf.at[prev_slot], sem.at[prev_slot]
            ).start()
            pend[0] = cid

    def cond(state):
        return state[1]

    def body(state):
        w, _ = state
        g = order_ref[0, 0, w]
        c0 = g * GROUP_SIZE

        # Member clusters: SMEM world-AABB pre-test; entered members join
        # the pipelined DMA/MT stream.
        for m in range(GROUP_SIZE):
            cid = c0 + m
            enter_m = _slab_smem(cid, jnp.where(live_row(), t_out[0], t_min))

            @pl.when(jnp.any(enter_m))
            def _go(cid=cid):
                _enqueue(cid)

        # Early exit: t_out may lag by the one still-pending cluster, which
        # only makes the cap conservative (never skips required work).
        bt_now = t_out[0]
        cap = jnp.max(jnp.where(live_row(), bt_now, 0.0))
        w2 = w + 1
        nxt = entry_ref[0, 0, jnp.minimum(w2, nv - 1)]
        cont = (w2 < nv) & (nxt < cap)
        return w2, cont

    cont0 = nv > 0
    jax.lax.while_loop(cond, body, (jnp.int32(0), cont0))

    # Drain: the last entered cluster is still pending.
    last = pend[0]

    @pl.when(last >= 0)
    def _drain():
        slot = pend[1]
        pltpu.make_async_copy(
            tris_ref.at[blk_ref[0, last]], buf.at[slot], sem.at[slot]
        ).wait()
        _mt_cluster(last, slot)


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min", "t_max", "interpret"))
def visit_pallas(
    nvis,  # (P,) i32 — per-packet candidate GROUP count
    order,  # (P, Gp) i32 — entry-sorted group ids
    entry_sorted,  # (P, Gp) f32
    o_p,  # (P, pk, 3)
    d_p,  # (P, pk, 3)
    act_p,  # (P, pk) bool
    tmax_p,  # (P, pk) f32 per-ray max distance
    cluster_aabbs,  # (C, 6) f32 world AABBs (ClusterData.aabbs)
    cnt,  # (C,) i32
    base,  # (C,) i32
    block_id,  # (C,) i32 (ClusterData.block_id)
    inst,  # (C,) i32 (ClusterData.inst)
    inv_rows,  # (n_inst, 12) f32 (ClusterData.inv_rows)
    tris_rk,  # (B, K/8 + 8, 128) f32 (ClusterData.tris_rk)
    any_hit: bool = False,
    t_min: float = 1e-4,
    t_max: float = 1e8,
    interpret: bool = False,
):
    n_pk, gp = order.shape
    pk = o_p.shape[1]
    c = cnt.shape[0]
    n_inst = inv_rows.shape[0]
    rows = tris_rk.shape[1]
    sub = rows - N_SUB
    instanced = n_inst > 1

    kernel = functools.partial(_visit_kernel, any_hit, t_min, t_max, sub, instanced)
    out_shape = [
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.int32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
    ]
    grid = (n_pk,)
    row3 = lambda p: (p, 0, 0)  # noqa: E731
    ray_spec = pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Scalar-indexed tables live in SMEM (Mosaic requires aligned
            # dynamic indexing in VMEM lanes; SMEM reads are scalar loads).
            pl.BlockSpec((1, 1, 1), row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, gp), row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, gp), row3, memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec,  # ox, oy, oz
            ray_spec, ray_spec, ray_spec,  # dx, dy, dz
            ray_spec,  # act
            ray_spec,  # tmax
            pl.BlockSpec((1, 6 * c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 12 * n_inst), lambda p: (0, 0), memory_space=pltpu.SMEM),
            # Cluster blocks stay in HBM and are DMA'd per visit (letting the
            # compiler pick VMEM breaks dynamic first-dim slicing in Mosaic).
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
        interpret=interpret,
    )(
        nvis.reshape(n_pk, 1, 1),
        order.reshape(n_pk, 1, gp),
        entry_sorted.reshape(n_pk, 1, gp),
        o_p[:, :, 0].reshape(n_pk, 1, pk),
        o_p[:, :, 1].reshape(n_pk, 1, pk),
        o_p[:, :, 2].reshape(n_pk, 1, pk),
        d_p[:, :, 0].reshape(n_pk, 1, pk),
        d_p[:, :, 1].reshape(n_pk, 1, pk),
        d_p[:, :, 2].reshape(n_pk, 1, pk),
        act_p.astype(jnp.int32).reshape(n_pk, 1, pk),
        tmax_p.reshape(n_pk, 1, pk),
        cluster_aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c),
        base.reshape(1, c),
        block_id.reshape(1, c),
        inst.reshape(1, c),
        inv_rows.reshape(1, 12 * n_inst),
        tris_rk,
    )
    return t.reshape(n_pk, pk), tri.reshape(n_pk, pk), u.reshape(n_pk, pk), v.reshape(n_pk, pk)
