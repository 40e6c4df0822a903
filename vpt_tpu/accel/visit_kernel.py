"""Pallas TPU kernel for the cluster visit phase.

The XLA while_loop visit (vpt_tpu.accel.cluster) is bandwidth-bound: every
iteration materializes ~15 (P, packet, V*K) f32 intermediates in HBM and all
packets march in lockstep with the slowest one.  This kernel gives each
packet its own program: candidates stream through a double-buffered VMEM
cluster block (one contiguous (9, K) DMA per visit), the Möller–Trumbore
math runs entirely in VMEM/registers at (packet x K), and each program exits
its own loop the moment its next candidate starts beyond every live ray's
best hit — no global stragglers.

Layout notes: triangles are component-major rows of the block (p0x..e2z), so
every arithmetic op is (packet, K) with K in vector lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _visit_kernel(
    any_hit: bool,
    t_min: float,
    t_max: float,
    order_ref,  # (1, 1, Cp) i32 — this packet's clusters, entry-sorted
    entry_ref,  # (1, 1, Cp) f32 — sorted entry distances (inf-padded)
    o_ref,  # (1, pk, 3) f32
    d_ref,  # (1, pk, 3) f32
    act_ref,  # (1, 1, pk) i32
    tmax_ref,  # (1, 1, pk) f32 — per-ray max distance (shadow rays stop short)
    aabb_ref,  # (1, 6C) f32 — per-cluster [minx,miny,minz,maxx,maxy,maxz]
    cnt_ref,  # (1, C) i32 — per-cluster triangle counts
    base_ref,  # (1, C) i32 — per-cluster start slot
    tris_ref,  # (C, 16, K) f32 in HBM — manual DMA (rows 9-15 padding)
    t_out,  # (1, 1, pk) f32
    tri_out,  # (1, 1, pk) i32
    u_out,  # (1, 1, pk) f32
    v_out,  # (1, 1, pk) f32
    buf,  # (2, 16, K) f32 VMEM scratch
    sem,  # (2,) DMA semaphores
):
    pk = o_ref.shape[1]
    k = buf.shape[2]
    cp = order_ref.shape[2]

    t_out[...] = tmax_ref[...]
    tri_out[...] = jnp.full((1, 1, pk), -1, jnp.int32)
    u_out[...] = jnp.zeros((1, 1, pk), jnp.float32)
    v_out[...] = jnp.zeros((1, 1, pk), jnp.float32)

    def dma(slot, w):
        cid = order_ref[0, 0, w]
        return pltpu.make_async_copy(tris_ref.at[cid], buf.at[slot], sem.at[slot])

    cont0 = entry_ref[0, 0, 0] < t_max

    # Ray columns (pk, 1); triangles broadcast along lanes.
    o_col = o_ref[0]  # (pk, 3)
    d_col = d_ref[0]
    ox, oy, oz = o_col[:, 0:1], o_col[:, 1:2], o_col[:, 2:3]
    dx, dy, dz = d_col[:, 0:1], d_col[:, 1:2], d_col[:, 2:3]
    act = act_ref[...].reshape(pk, 1) > 0  # reshape the i32, not the bool
    # (Mosaic can't reshape sub-32-bit types with a new minor dim)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def cond(state):
        return state[1]

    def body(state):
        w, _ = state
        slot = jnp.int32(0)
        cid = order_ref[0, 0, w]
        # Exact per-ray slab test against this cluster's AABB: when no ray in
        # the packet enters the box before its current best hit, skip the
        # whole DMA + triangle block (most candidates die here — the phase-1
        # cull is only bundle-conservative).
        bt0 = t_out[...].reshape(pk, 1)
        tn = jnp.full((pk, 1), t_min, jnp.float32)
        tf = bt0
        for ax, (oc, dc) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
            bmn = aabb_ref[0, 6 * cid + ax]
            bmx = aabb_ref[0, 6 * cid + 3 + ax]
            inv = 1.0 / jnp.where(jnp.abs(dc) > 1e-20, dc, 1e-20)
            s0 = (bmn - oc) * inv
            s1 = (bmx - oc) * inv
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        ray_hits_box = (tn <= tf) & act
        packet_hits = jnp.any(ray_hits_box)

        @pl.when(packet_hits)
        def _do_cluster():
            _test_cluster(w, slot, ray_hits_box)

        w2 = w + 1
        bt_now = t_out[...].reshape(pk, 1)
        if any_hit:
            live = act & (tri_out[...].reshape(pk, 1) < 0)
        else:
            live = act
        cap = jnp.max(jnp.where(live, bt_now, 0.0))
        nxt = entry_ref[0, 0, jnp.minimum(w2, cp - 1)]
        cont = (w2 < cp) & (nxt < cap)
        return w2, cont

    def _test_cluster(w, slot, ray_hits_box):
        d0 = dma(slot, w)
        d0.start()
        d0.wait()
        blk = buf[slot]  # (9, K)
        p0x, p0y, p0z = blk[0:1, :], blk[1:2, :], blk[2:3, :]
        e1x, e1y, e1z = blk[3:4, :], blk[4:5, :], blk[5:6, :]
        e2x, e2y, e2z = blk[6:7, :], blk[7:8, :], blk[8:9, :]

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

        cid = order_ref[0, 0, w]
        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]
        bt = t_out[...].reshape(pk, 1)

        valid = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > t_min)
            & (t < bt)
            & (lane < cnt)
            & act
            & ray_hits_box
        )
        t_masked = jnp.where(valid, t, jnp.inf)
        t_best = jnp.min(t_masked, axis=1, keepdims=True)  # (pk, 1)
        j = jnp.argmin(t_masked, axis=1)[:, None]  # (pk, 1)
        onehot = lane == j
        u_best = jnp.sum(jnp.where(onehot, u, 0.0), axis=1, keepdims=True)
        v_best = jnp.sum(jnp.where(onehot, v, 0.0), axis=1, keepdims=True)

        better = jnp.isfinite(t_best)
        new_t = jnp.where(better, t_best, bt)
        t_out[...] = new_t.reshape(1, 1, pk)
        tri_out[...] = jnp.where(
            better, base + j, tri_out[...].reshape(pk, 1)
        ).reshape(1, 1, pk)
        u_out[...] = jnp.where(better, u_best, u_out[...].reshape(pk, 1)).reshape(1, 1, pk)
        v_out[...] = jnp.where(better, v_best, v_out[...].reshape(pk, 1)).reshape(1, 1, pk)

    jax.lax.while_loop(cond, body, (jnp.int32(0), cont0))


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min", "t_max", "interpret"))
def visit_pallas(
    order,  # (P, Cp) i32
    entry_sorted,  # (P, Cp) f32
    o_p,  # (P, pk, 3)
    d_p,  # (P, pk, 3)
    act_p,  # (P, pk) bool
    tmax_p,  # (P, pk) f32 per-ray max distance
    aabbs,  # (C, 6) f32 cluster bounds [min, max]
    cnt,  # (C,) i32
    base,  # (C,) i32
    tris,  # (C, 9, K) f32
    any_hit: bool = False,
    t_min: float = 1e-4,
    t_max: float = 1e8,
    interpret: bool = False,
):
    n_pk, cp = order.shape
    pk = o_p.shape[1]
    c = cnt.shape[0]
    k = tris.shape[2]

    kernel = functools.partial(_visit_kernel, any_hit, t_min, t_max)
    out_shape = [
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.int32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
        jax.ShapeDtypeStruct((n_pk, 1, pk), jnp.float32),
    ]
    grid = (n_pk,)
    row3 = lambda p: (p, 0, 0)  # noqa: E731
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Scalar-indexed tables live in SMEM (Mosaic requires aligned
            # dynamic indexing in VMEM lanes; SMEM reads are scalar loads).
            pl.BlockSpec((1, 1, cp), row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cp), row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, pk, 3), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pk, 3), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6 * c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda p: (0, 0), memory_space=pltpu.SMEM),
            # Cluster blocks stay in HBM and are DMA'd per visit (letting the
            # compiler pick VMEM breaks dynamic first-dim slicing in Mosaic).
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pk), row3, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 16, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        order.reshape(n_pk, 1, cp),
        entry_sorted.reshape(n_pk, 1, cp),
        o_p,
        d_p,
        act_p.astype(jnp.int32).reshape(n_pk, 1, pk),
        tmax_p.reshape(n_pk, 1, pk),
        aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c),
        base.reshape(1, c),
        tris,
    )
    return t.reshape(n_pk, pk), tri.reshape(n_pk, pk), u.reshape(n_pk, pk), v.reshape(n_pk, pk)
