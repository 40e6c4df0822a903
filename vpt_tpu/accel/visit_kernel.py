"""Pallas TPU kernel for the cluster visit phase.

Replaces TraceRay / RayQuery hardware traversal (RTCommon.slang:47-117).
Each 128-ray packet is one grid program: it marches its entry-sorted,
pre-compacted candidate list (built by the exact per-ray cull in
vpt_tpu.accel.cluster), streaming one cluster block per visit through a
2-slot VMEM buffer (the next candidate's DMA starts before this one's
triangle math), and exits the moment the next candidate starts beyond every
live ray's best hit.

Layout (the part that makes it fast):

* Rays live in LANES: every per-ray quantity (origins, directions, best-t,
  masks) is a (1, 128) single-vreg row, so the bookkeeping around each
  visit costs ~1 vector issue per op instead of 16.
* Triangles live in SUBLANES, 8 sub-blocks of K/8 triangles interleaved
  across the 128 lanes of the storage block (ClusterData.tris_rk): component
  j of sub-block s is the (K/8, 1) column s*16+j.  The Möller-Trumbore
  block for one sub-block is (K/8, 128) — triangle index broadcasts down
  sublanes, rays across lanes, both operands broadcast naturally.
* Each sub-block has its own AABB (SMEM side table): a ~20-issue slab test
  against the packet skips the whole (K/8 x 128) MT block when no live ray
  enters — the win that pays for everything else, since the kernel is
  otherwise MT-flop-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SUB = 8  # sub-blocks per cluster


def _visit_kernel(
    any_hit: bool,
    t_min: float,
    t_max: float,
    nv_ref,  # (1, 1, 1) i32 SMEM — number of real candidates for this packet
    order_ref,  # (1, 1, Cp) i32 SMEM — this packet's clusters, entry-sorted
    entry_ref,  # (1, 1, Cp) f32 SMEM — sorted entry distances (inf-padded)
    ox_ref, oy_ref, oz_ref,  # (1, 1, pk) f32 ray origins
    dx_ref, dy_ref, dz_ref,  # (1, 1, pk) f32 ray directions
    act_ref,  # (1, 1, pk) i32
    tmax_ref,  # (1, 1, pk) f32 — per-ray max distance (shadow rays stop short)
    sab_ref,  # (1, 48C) f32 SMEM — sub-block AABBs [s*6: min.xyz, max.xyz]
    cnt_ref,  # (1, C) i32 SMEM — per-cluster triangle counts
    base_ref,  # (1, C) i32 SMEM — per-cluster start slot
    tris_ref,  # (C, K/8, 128) f32 HBM — manual DMA (ClusterData.tris_rk)
    t_out,  # (1, 1, pk) f32
    tri_out,  # (1, 1, pk) i32
    u_out,  # (1, 1, pk) f32
    v_out,  # (1, 1, pk) f32
    buf,  # (2, K/8, 128) f32 VMEM scratch
    sem,  # (2,) DMA semaphores
):
    pk = ox_ref.shape[2]
    sub = buf.shape[1]

    t_out[...] = tmax_ref[...]
    tri_out[...] = jnp.full((1, 1, pk), -1, jnp.int32)
    u_out[...] = jnp.zeros((1, 1, pk), jnp.float32)
    v_out[...] = jnp.zeros((1, 1, pk), jnp.float32)

    def dma(slot, w):
        cid = order_ref[0, 0, w]
        return pltpu.make_async_copy(tris_ref.at[cid], buf.at[slot], sem.at[slot])

    nv = nv_ref[0, 0, 0]
    cont0 = nv > 0

    # Per-ray rows (1, pk) — one vreg each.
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    act = act_ref[0] > 0
    inv_x = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    inv_y = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    inv_z = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, pk), 0)

    def _mt_sub(s, blk, live_row, cnt, base):
        """Möller-Trumbore on sub-block s: (sub, pk), triangles x rays."""
        c0 = s * 16

        def col(j):
            return blk[:, c0 + j : c0 + j + 1]  # (sub, 1)

        p0x, p0y, p0z = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3), col(4), col(5)
        e2x, e2y, e2z = col(6), col(7), col(8)

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
            & live_row
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

    def cond(state):
        return state[1]

    def body(state):
        # State: (w, cont, pf) — iteration w runs (cont), DMA for w is in
        # flight (pf; started by the previous iteration or the warmup).
        w, _, _ = state
        slot = jax.lax.rem(w, 2)
        cid = order_ref[0, 0, w]
        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]

        # Prefetch decision from the pre-merge cap (a superset of the
        # post-merge continuation, so `cont` below implies `pf` and the loop
        # never runs an un-started iteration).
        bt0 = t_out[0]
        if any_hit:
            live0 = act & (tri_out[0] < 0)
        else:
            live0 = act
        cap0 = jnp.max(jnp.where(live0, bt0, 0.0))
        w2 = w + 1
        nxt = entry_ref[0, 0, jnp.minimum(w2, nv - 1)]
        pf_next = (w2 < nv) & (nxt < cap0)

        dma(slot, w).wait()

        # Start the next cluster's DMA right after this one's wait (a single
        # DMA outstanding at any time — two outstanding per instance ABORTS
        # the runtime when two kernel instances share one XLA program) so it
        # streams in behind the triangle math below.
        @pl.when(pf_next)
        def _prefetch():
            dma(1 - slot, w2).start()

        blk = buf[slot]

        # Sub-block slab tests: ~20 single-vreg issues each, skipping whole
        # (sub x pk) MT blocks no live ray can hit.
        for s in range(N_SUB):
            o6 = 48 * cid + 6 * s
            bt_s = t_out[0]
            if any_hit:
                live_s = act & (tri_out[0] < 0)
            else:
                live_s = act
            tn = jnp.full((1, pk), t_min, jnp.float32)
            tf = bt_s
            for ax, (oc, ic) in enumerate(
                ((ox, inv_x), (oy, inv_y), (oz, inv_z))
            ):
                s0 = (sab_ref[0, o6 + ax] - oc) * ic
                s1 = (sab_ref[0, o6 + 3 + ax] - oc) * ic
                tn = jnp.maximum(tn, jnp.minimum(s0, s1))
                tf = jnp.minimum(tf, jnp.maximum(s0, s1))
            enter = (tn <= tf) & live_s

            @pl.when(jnp.any(enter))
            def _do_sub(s=s, enter=enter, cnt=cnt, base=base):
                _mt_sub(s, blk, enter, cnt, base)

        bt_now = t_out[0]
        if any_hit:
            live = act & (tri_out[0] < 0)
        else:
            live = act
        cap = jnp.max(jnp.where(live, bt_now, 0.0))
        cont = pf_next & (nxt < cap)
        return w2, cont, pf_next

    @pl.when(cont0)
    def _warmup():
        dma(jnp.int32(0), jnp.int32(0)).start()

    w_f, _, pf_f = jax.lax.while_loop(cond, body, (jnp.int32(0), cont0, cont0))

    # The loop may exit with the prefetch for w_f still in flight (started
    # under the conservative pre-merge cap); drain it before the program ends.
    @pl.when(pf_f)
    def _drain():
        dma(jax.lax.rem(w_f, 2), w_f).wait()


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min", "t_max", "interpret"))
def visit_pallas(
    nvis,  # (P,) i32 — per-packet candidate count (compacted list length)
    order,  # (P, Cp) i32
    entry_sorted,  # (P, Cp) f32
    o_p,  # (P, pk, 3)
    d_p,  # (P, pk, 3)
    act_p,  # (P, pk) bool
    tmax_p,  # (P, pk) f32 per-ray max distance
    sub_aabbs,  # (C, 48) f32 sub-block bounds (ClusterData.sub_aabbs)
    cnt,  # (C,) i32
    base,  # (C,) i32
    tris_rk,  # (C, K/8, 128) f32 (ClusterData.tris_rk)
    any_hit: bool = False,
    t_min: float = 1e-4,
    t_max: float = 1e8,
    interpret: bool = False,
):
    n_pk, cp = order.shape
    pk = o_p.shape[1]
    c = cnt.shape[0]
    sub = tris_rk.shape[1]

    kernel = functools.partial(_visit_kernel, any_hit, t_min, t_max)
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
            pl.BlockSpec((1, 1, cp), row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cp), row3, memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec,  # ox, oy, oz
            ray_spec, ray_spec, ray_spec,  # dx, dy, dz
            ray_spec,  # act
            ray_spec,  # tmax
            pl.BlockSpec((1, 48 * c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            # Cluster blocks stay in HBM and are DMA'd per visit (letting the
            # compiler pick VMEM breaks dynamic first-dim slicing in Mosaic).
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, sub, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        nvis.reshape(n_pk, 1, 1),
        order.reshape(n_pk, 1, cp),
        entry_sorted.reshape(n_pk, 1, cp),
        o_p[:, :, 0].reshape(n_pk, 1, pk),
        o_p[:, :, 1].reshape(n_pk, 1, pk),
        o_p[:, :, 2].reshape(n_pk, 1, pk),
        d_p[:, :, 0].reshape(n_pk, 1, pk),
        d_p[:, :, 1].reshape(n_pk, 1, pk),
        d_p[:, :, 2].reshape(n_pk, 1, pk),
        act_p.astype(jnp.int32).reshape(n_pk, 1, pk),
        tmax_p.reshape(n_pk, 1, pk),
        sub_aabbs.reshape(1, 48 * c),
        cnt.reshape(1, c),
        base.reshape(1, c),
        tris_rk,
    )
    return t.reshape(n_pk, pk), tri.reshape(n_pk, pk), u.reshape(n_pk, pk), v.reshape(n_pk, pk)
