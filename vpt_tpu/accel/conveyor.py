"""Conveyor trace: grid-pipelined (supertile, group) work items.

The stream kernel (vpt_tpu.accel.stream) walks each 32K-ray band's
candidate clusters with in-kernel scalar loops and single-buffered manual
DMAs; its measured cost is dominated by ~3 us of scalar orchestration +
DMA latency per supertile visit, not by vector math.  This module moves
the schedule OUT of the kernel: the host (XLA) side builds a flat,
entry-sorted work-item table and the Pallas grid runs one step per item,
so Mosaic's grid pipeline overlaps every triangle-block DMA with the
previous item's compute and the per-item scalar tax drops to a table
lookup (the idiomatic TPU block-sparse pattern — scalar prefetch +
data-dependent BlockSpec index maps).

Layout:
  - rays are sorted by their (first, second) entered group (coherence),
    split into S = N/1024 supertiles of (8, 128);
  - per supertile, candidate groups (any member ray enters the group
    AABB) are sorted by entry distance; the first K_SLOTS-1 become grid
    items, the tail (rare) is handled by a continuation slot that loops
    over the remaining groups with manual DMAs;
  - grid = (S, K_SLOTS): item (s, 0) initialises s's output block, every
    item processes one group: per member cluster, an (8, 128) slab test
    against the ray's CURRENT best (exact per-ray early termination),
    then Moller-Trumbore in (sub, 128) tiles on entering rows only;
  - outputs/ray blocks revisit across the K dimension (stay in VMEM),
    triangle group-blocks change every step (pipelined HBM->VMEM DMA).

Front-to-back exactness: a supertile's items are processed in entry
order; an item whose group entry exceeds the supertile's cap (max
current-best t over live rays) cannot improve any ray and is skipped at
one scalar compare (entries are monotone, so every later item skips
too).  Closest-hit ordering matches the reference TraceRay
(RTCommon.slang:47-117); per-ray any-hit matches DoesRayIntersectWithAS
(rays with bit1 flags stop improving after the first found hit).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vpt_tpu.accel.cluster import ClusterData, _slab_tn_tf, PACKET_SIZE
from vpt_tpu.accel.traverse import Hit, T_MAX, T_MIN
from vpt_tpu.accel.visit_kernel import GROUP_SIZE, N_SUB

SUPER_ROWS = 8             # rows per supertile -> (8, 128) = 1024 rays
K_SLOTS = int(os.environ.get("VPT_CONV_K", "16"))

_FLAG_ACT = 1
_FLAG_ANYHIT = 2
# igrp sentinels (valid group ids are >= 0)
_PAD = -1                  # no candidate in this slot
_CONT = -2                 # continuation: walk the overflow table


def _conveyor_kernel(
    t_min: float,
    sub: int,              # triangles per sub-block (= K / 8)
    k_slots: int,
    instanced: bool,
    # ---- scalar prefetch (SMEM, full arrays) ----
    igrp_ref,              # (S*K,) i32 — item group id / sentinel
    ient_ref,              # (S*K,) f32 — item group entry (inf for pads)
    ncand_ref,             # (S,) i32 — candidate count per supertile
    # ---- blocked inputs ----
    ovg_ref,               # (1, 1, Gp) SMEM — st's full sorted group list
    ovent_ref,             # (1, 1, Gp) SMEM f32 — matching entries
    rays_ref,              # (1, 10, 8, 128) VMEM — o.xyz d.xyz inv.xyz tmax
    flags_ref,             # (1, 8, 128) VMEM i32
    tg_ref,                # (GROUP_SIZE, rows, 128) VMEM — pipelined blocks
    # ---- global SMEM cluster tables ----
    cab_ref,               # (1, 6C) f32 world AABBs
    cnt_ref,               # (1, C) i32
    base_ref,              # (1, C) i32 virtual tri base
    inst_ref,              # (1, C) i32 instance id
    inv_ref,               # (1, 12*n_inst) f32 world->local affines
    tg_hbm,                # ANY (C, rows, 128) — overflow manual DMA source
    # ---- outputs (1, 8, 128) ----
    t_out, tri_out, u_out, v_out,
    # ---- scratch ----
    obuf,                  # (GROUP_SIZE, rows, 128) VMEM — overflow block
    osem,                  # DMA semaphore
):
    s = pl.program_id(0)
    k = pl.program_id(1)
    item = s * k_slots + k

    o8 = (rays_ref[0], rays_ref[1], rays_ref[2])
    d8 = (rays_ref[3], rays_ref[4], rays_ref[5])
    inv8 = (rays_ref[6], rays_ref[7], rays_ref[8])
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    @pl.when(k == 0)
    def _init():
        t_out[...] = rays_ref[9]
        tri_out[...] = jnp.full((SUPER_ROWS, 128), -1, jnp.int32)
        u_out[...] = jnp.zeros((SUPER_ROWS, 128), jnp.float32)
        v_out[...] = jnp.zeros((SUPER_ROWS, 128), jnp.float32)

    def live_mask():
        fl = flags_ref[...]
        return ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri_out[...] < 0)
        )

    def cap():
        return jnp.max(jnp.where(live_mask(), t_out[...], t_min))

    def _enter(cid):
        """(8,128) live rays entering cluster `cid` before their best."""
        live = live_mask()
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(live, t_out[...], t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & live

    def _mt_rows(buf, m, cid, enter):
        """Sub-AABB + Moller-Trumbore on rows of `enter`, triangles from
        buf[m] ((rows, 128), sub-block interleaved — see
        ClusterData.tris_rk)."""
        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]
        meta = buf[m, sub : sub + N_SUB]   # (8, 128): row s lanes 0:6 AABB

        if instanced:
            i12 = inst_ref[0, cid] * 12
            T = [inv_ref[0, i12 + j] for j in range(12)]
            lox = T[0] * o8[0] + T[1] * o8[1] + T[2] * o8[2] + T[3]
            loy = T[4] * o8[0] + T[5] * o8[1] + T[6] * o8[2] + T[7]
            loz = T[8] * o8[0] + T[9] * o8[1] + T[10] * o8[2] + T[11]
            ldx = T[0] * d8[0] + T[1] * d8[1] + T[2] * d8[2]
            ldy = T[4] * d8[0] + T[5] * d8[1] + T[6] * d8[2]
            ldz = T[8] * d8[0] + T[9] * d8[1] + T[10] * d8[2]
            linv_x = 1.0 / jnp.where(jnp.abs(ldx) > 1e-20, ldx, 1e-20)
            linv_y = 1.0 / jnp.where(jnp.abs(ldy) > 1e-20, ldy, 1e-20)
            linv_z = 1.0 / jnp.where(jnp.abs(ldz) > 1e-20, ldz, 1e-20)
        else:
            lox, loy, loz = o8
            ldx, ldy, ldz = d8
            linv_x, linv_y, linv_z = inv8

        for r in range(SUPER_ROWS):
            er = enter[r : r + 1, :]   # (1, 128)

            @pl.when(jnp.any(er))
            def _row(r=r, er=er):
                ro = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                rd = (ldx[r : r + 1], ldy[r : r + 1], ldz[r : r + 1])
                ri = (linv_x[r : r + 1], linv_y[r : r + 1], linv_z[r : r + 1])
                best_t = t_out[r : r + 1, :]
                best_tri = tri_out[r : r + 1, :]
                best_u = u_out[r : r + 1, :]
                best_v = v_out[r : r + 1, :]
                for sb in range(N_SUB):
                    stn = jnp.full((1, 128), t_min, jnp.float32)
                    stf = jnp.where(er, best_t, t_min)
                    for ax in range(3):
                        lo = meta[sb : sb + 1, ax : ax + 1]
                        hi = meta[sb : sb + 1, 3 + ax : 4 + ax]
                        s0 = (lo - ro[ax]) * ri[ax]
                        s1 = (hi - ro[ax]) * ri[ax]
                        stn = jnp.maximum(stn, jnp.minimum(s0, s1))
                        stf = jnp.minimum(stf, jnp.maximum(s0, s1))
                    sub_enter = (stn <= stf) & er
                    c0 = sb * 16

                    def col(kk):
                        return buf[m, 0:sub, c0 + kk : c0 + kk + 1]  # (sub, 1)

                    p0x, p0y, p0z = col(0), col(1), col(2)
                    e1x, e1y, e1z = col(3), col(4), col(5)
                    e2x, e2y, e2z = col(6), col(7), col(8)
                    pvx = rd[1] * e2z - rd[2] * e2y
                    pvy = rd[2] * e2x - rd[0] * e2z
                    pvz = rd[0] * e2y - rd[1] * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx = ro[0] - p0x
                    tvy = ro[1] - p0y
                    tvz = ro[2] - p0z
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (rd[0] * qvx + rd[1] * qvy + rd[2] * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    tri_idx = idx0[:sub] + sb * sub
                    valid = (
                        (jnp.abs(det) > 1e-12)
                        & (uu >= 0.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > t_min)
                        & (tt < best_t)
                        & (tri_idx < cnt)
                        & sub_enter
                    )
                    t_masked = jnp.where(valid, tt, jnp.inf)
                    t_best = jnp.min(t_masked, axis=0, keepdims=True)
                    jj = jnp.min(
                        jnp.where(t_masked == t_best, idx0[:sub], sub),
                        axis=0, keepdims=True,
                    )
                    pick = idx0[:sub] == jj
                    u_best = jnp.sum(
                        jnp.where(pick, uu, 0.0), axis=0, keepdims=True
                    )
                    v_best = jnp.sum(
                        jnp.where(pick, vv, 0.0), axis=0, keepdims=True
                    )
                    better = t_best < best_t
                    best_t = jnp.where(better, t_best, best_t)
                    best_tri = jnp.where(better, base + sb * sub + jj, best_tri)
                    best_u = jnp.where(better, u_best, best_u)
                    best_v = jnp.where(better, v_best, best_v)

                t_out[r : r + 1, :] = best_t
                tri_out[r : r + 1, :] = best_tri
                u_out[r : r + 1, :] = best_u
                v_out[r : r + 1, :] = best_v

    def _process_group(buf, g):
        for m in range(GROUP_SIZE):
            cid = g * GROUP_SIZE + m

            @pl.when(cnt_ref[0, cid] > 0)
            def _m(cid=cid):
                enter = _enter(cid)

                @pl.when(jnp.any(enter))
                def _go():
                    _mt_rows(buf, m, cid, enter)

    g_item = igrp_ref[item]

    @pl.when((g_item >= 0) & (ient_ref[item] <= cap()))
    def _main():
        _process_group(tg_ref, g_item)

    @pl.when(g_item == _CONT)
    def _overflow():
        nc = ncand_ref[s]

        def cond(j):
            return (j < nc) & (ovent_ref[0, j] <= cap())

        def body(j):
            g2 = ovg_ref[0, j]
            pltpu.make_async_copy(
                tg_hbm.at[pl.ds(g2 * GROUP_SIZE, GROUP_SIZE)], obuf, osem
            ).start()
            pltpu.make_async_copy(
                tg_hbm.at[pl.ds(g2 * GROUP_SIZE, GROUP_SIZE)], obuf, osem
            ).wait()
            _process_group(obuf, g2)
            return j + 1

        jax.lax.while_loop(cond, body, jnp.int32(k_slots - 1))


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def conveyor_pallas(
    igrp,             # (S, K) i32
    ient,             # (S, K) f32
    ncand,            # (S,) i32
    ovg,              # (S, Gp) i32
    ovent,            # (S, Gp) f32
    rays,             # (S, 10, 8, 128) f32
    flags,            # (S, 8, 128) i32
    tg,               # (C, rows, 128) f32 — cluster-ordered kernel blocks
    cluster_aabbs,    # (C, 6)
    cnt, base, inst,  # (C,) i32
    inv_rows,         # (n_inst, 12)
    t_min: float,
    interpret: bool = False,
):
    s, k = igrp.shape
    gp = ovg.shape[1]
    c = cluster_aabbs.shape[0]
    n_inst = inv_rows.shape[0]
    rows = tg.shape[1]
    sub = rows - N_SUB
    instanced = n_inst > 1

    kernel = functools.partial(
        _conveyor_kernel, t_min, sub, k, instanced
    )

    def smem_st(w):
        return pl.BlockSpec(
            (None, 1, w), lambda si, ki, *sc: (si, 0, 0),
            memory_space=pltpu.SMEM,
        )

    def smem_glob(w):
        return pl.BlockSpec(
            (1, w), lambda si, ki, *sc: (0, 0), memory_space=pltpu.SMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s, k),
        in_specs=[
            smem_st(gp),   # ovg
            smem_st(gp),   # ovent
            pl.BlockSpec(
                (None, 10, SUPER_ROWS, 128),
                lambda si, ki, *sc: (si, 0, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, SUPER_ROWS, 128),
                lambda si, ki, *sc: (si, 0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (GROUP_SIZE, rows, 128),
                lambda si, ki, igrp_s, ient_s, ncand_s: (
                    jnp.maximum(igrp_s[si * k + ki], 0), 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            smem_glob(6 * c),   # cab
            smem_glob(c),       # cnt
            smem_glob(c),       # base
            smem_glob(c),       # inst
            smem_glob(12 * n_inst),   # inv
            pl.BlockSpec(memory_space=pltpu.HBM),   # tg_hbm (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec(
                (None, SUPER_ROWS, 128),
                lambda si, ki, *sc: (si, 0, 0), memory_space=pltpu.VMEM,
            )
        ] * 4,
        scratch_shapes=[
            pltpu.VMEM((GROUP_SIZE, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    shape3 = jax.ShapeDtypeStruct((s, SUPER_ROWS, 128), jnp.float32)
    shape3i = jax.ShapeDtypeStruct((s, SUPER_ROWS, 128), jnp.int32)
    t_o, tri_o, u_o, v_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shape3, shape3i, shape3, shape3],
        interpret=interpret,
    )(
        igrp.reshape(s * k),
        ient.reshape(s * k),
        ncand,
        ovg.reshape(s, 1, gp),
        ovent.reshape(s, 1, gp),
        rays, flags, tg,
        cluster_aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c), base.reshape(1, c), inst.reshape(1, c),
        inv_rows.reshape(1, 12 * n_inst),
        tg,
    )
    return t_o, tri_o, u_o, v_o


def intersect_conveyor(
    origin,
    direction,
    cl: ClusterData,
    t_min=T_MIN,
    t_max=T_MAX,
    active=None,
    anyhit=None,
    interpret: bool = False,
) -> Hit:
    """Closest-hit (or per-ray any-hit) wavefront intersection via the
    conveyor kernel.  Drop-in replacement for intersect_stream (same
    semantics; see module docstring for the scheduling difference)."""
    n_orig = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    if active is None:
        active = jnp.ones(n_orig, bool)
    if anyhit is None:
        anyhit = jnp.zeros(n_orig, bool)

    super_n = SUPER_ROWS * 128
    pad = (-n_orig) % super_n
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, jnp.float32)])
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        tmax_arr = jnp.concatenate([tmax_arr, jnp.full(pad, t_min, jnp.float32)])
        active = jnp.concatenate([active, jnp.zeros(pad, bool)])
        anyhit = jnp.concatenate([anyhit, jnp.zeros(pad, bool)])
    n = origin.shape[0]

    # Root-exit bound (see intersect_clusters): no hit can lie beyond the
    # ray's exit from the scene root box.
    root_min = jnp.min(cl.group_min, axis=0)
    root_max = jnp.max(cl.group_max, axis=0)
    inv_all = 1.0 / jnp.where(jnp.abs(direction) > 1e-20, direction, 1e-20)
    r0 = (root_min[None, :] - origin) * inv_all
    r1 = (root_max[None, :] - origin) * inv_all
    tn_root = jnp.max(jnp.minimum(r0, r1), axis=1)
    tf_root = jnp.min(jnp.maximum(r0, r1), axis=1)
    exit_bound = jnp.where(
        tn_root <= tf_root, tf_root * 1.0001 + jnp.float32(t_min),
        jnp.float32(t_min),
    )
    tmax_arr = jnp.minimum(tmax_arr, jnp.maximum(exit_bound, jnp.float32(t_min)))
    tmax_arr = jnp.where(active, tmax_arr, jnp.float32(t_min))

    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate(
        [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T

    # ---- sort rays by (first, second) entered group --------------------
    n_pk = n // PACKET_SIZE          # super_n is a multiple of PACKET_SIZE
    chunk = PACKET_SIZE
    tn0, tf0 = _slab_tn_tf(
        origin.reshape(n_pk, chunk, 3),
        direction.reshape(n_pk, chunk, 3),
        tmax_arr.reshape(n_pk, chunk), gmin_pad, gmax_pad, t_min,
    )
    ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)
    sentinel = jnp.int32(g_padded)
    ids_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
    first = jnp.argmin(ent, axis=1).astype(jnp.int32)
    v1 = jnp.min(ent, axis=1)
    ent2 = jnp.where(ids_row == first[:, None], jnp.inf, ent)
    second = jnp.argmin(ent2, axis=1).astype(jnp.int32)
    v2 = jnp.min(ent2, axis=1)
    first = jnp.where(jnp.isfinite(v1), first, sentinel)
    second = jnp.where(jnp.isfinite(v2), second, sentinel)
    key = first * (g_padded + 1) + second
    key = jnp.where(active, key, jnp.int32(1 << 30))

    flags = active.astype(jnp.int32) + anyhit.astype(jnp.int32) * 2
    lane = jax.lax.iota(jnp.int32, n)
    (_, lane_key, ox, oy, oz, dxs, dys, dzs, tmax_s, flags_s) = jax.lax.sort(
        (key, lane, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         tmax_arr, flags),
        num_keys=1, is_stable=True,
    )

    # ---- per-supertile candidate tables --------------------------------
    s_n = n // super_n
    o_s = jnp.stack([ox, oy, oz], axis=-1).reshape(s_n, super_n, 3)
    d_s = jnp.stack([dxs, dys, dzs], axis=-1).reshape(s_n, super_n, 3)
    act_s = (flags_s & 1) > 0
    tm_eff = jnp.where(act_s, tmax_s, jnp.float32(t_min)).reshape(s_n, super_n)
    tns, tfs = _slab_tn_tf(o_s, d_s, tm_eff, gmin_pad, gmax_pad, t_min)
    enter_st = tns <= tfs                                  # (S, 1024, Gp)
    st_any = jnp.any(enter_st, axis=1)                     # (S, Gp)
    st_entry = jnp.min(jnp.where(enter_st, tns, jnp.inf), axis=1)

    real_g = (jnp.arange(g_padded, dtype=jnp.int32) < g)[None, :]
    present = st_any & real_g
    gids = jnp.broadcast_to(
        jnp.arange(g_padded, dtype=jnp.int32)[None, :], (s_n, g_padded)
    )
    entry_key = jnp.where(present, st_entry, jnp.inf)
    ovent, ovg = jax.lax.sort((entry_key, gids), dimension=1, num_keys=1)
    ncand = jnp.sum(present, axis=1).astype(jnp.int32)

    k_slots = max(2, min(K_SLOTS, g_padded))
    igrp = ovg[:, :k_slots]
    ient = ovent[:, :k_slots]
    slot_ids = jnp.arange(k_slots, dtype=jnp.int32)[None, :]
    igrp = jnp.where(slot_ids < ncand[:, None], igrp, _PAD)
    ient = jnp.where(slot_ids < ncand[:, None], ient, jnp.inf)
    # Continuation slot: when the candidate list spills past the grid
    # items, the last slot walks the tail from the overflow table.
    overflow = ncand > k_slots
    igrp = igrp.at[:, k_slots - 1].set(
        jnp.where(overflow, _CONT, igrp[:, k_slots - 1])
    )
    ient = ient.at[:, k_slots - 1].set(
        jnp.where(overflow, ovent[:, k_slots - 1], ient[:, k_slots - 1])
    )

    # ---- kernel inputs --------------------------------------------------
    inv_s = 1.0 / jnp.where(
        jnp.abs(jnp.stack([dxs, dys, dzs], axis=0)) > 1e-20,
        jnp.stack([dxs, dys, dzs], axis=0), 1e-20,
    )
    shape_st = (s_n, SUPER_ROWS, 128)
    rays = jnp.stack(
        [a.reshape(shape_st) for a in (ox, oy, oz, dxs, dys, dzs)]
        + [inv_s[i].reshape(shape_st) for i in range(3)]
        + [tm_eff.reshape(shape_st)],
        axis=1,
    )                                                     # (S, 10, 8, 128)
    tg = cl.tris_rk[cl.block_id]                          # (C, rows, 128)

    bt, btri, bu, bv = conveyor_pallas(
        igrp, ient, ncand, ovg, ovent,
        rays, flags_s.reshape(shape_st), tg,
        cl.aabbs, cl.count, cl.start, cl.inst, cl.inv_rows,
        t_min=float(t_min), interpret=interpret,
    )
    best_t = bt.reshape(n)
    best_tri = btri.reshape(n)
    found = best_tri >= 0
    hit_t = jnp.where(found, best_t, -1.0)

    (_, t_u, tri_u, u_u, v_u) = jax.lax.sort(
        (lane_key, hit_t, best_tri, bu.reshape(n), bv.reshape(n)),
        num_keys=1, is_stable=True,
    )
    if pad:
        t_u, tri_u, u_u, v_u = (a[:n_orig] for a in (t_u, tri_u, u_u, v_u))
    return Hit(t=t_u, tri=tri_u, u=u_u, v=v_u)
