"""Any-hit occlusion kernel — the TPU MissShadow fast path.

The reference's shadow rays are trivially cheap: sky-NEE uses an any-hit
query that only answers "blocked or not" (DoesRayIntersectWithAS,
RTCommon.slang:47-84 + MissShadow.slang:4-9), and light-NEE compares the
closest hit's triangle id against the sampled one
(ClosestHit.slang:169-176).  Routing both through the closest-hit stream
kernel (as in round 3) makes shadow traces cost MORE than main traces:
they pay best-t refinement, u/v/tri outputs and front-to-back caps they
never use.

This module is a dedicated occlusion pipeline over the same cluster data:

  * light-NEE becomes any-hit by EXCLUDING the sampled triangle id
    per-ray: blocked iff any OTHER triangle intersects before t_max.
    (Equivalent to the reference's closest==target compare except when a
    different triangle lies at exactly the target's distance.)
  * sort key = FIRST entered group only (one argmin, not two) — blocked
    rays don't need the second-cluster coherence,
  * no best-t state: the per-visit output is one bit per ray, the MT
    inner loop is ~half the closest-hit op count (no min/tie-break/uv),
  * per-supertile `undone` screens (one SMEM compare per candidate bit)
    retire supertiles the moment all their live rays are blocked, and the
    band's candidate loop exits when every supertile is done,
  * same row-gated visit schedule as the round-4 stream kernel: a
    cluster slab feeds an 8-bit row mask, each entering row's sub-slab
    feeds an 8-bit sub mask, and Moller-Trumbore runs on set bits only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vpt_tpu.accel import envelope
from vpt_tpu.accel.cluster import ClusterData
from vpt_tpu.accel.stream import _MT_DENSE, SUPER_ROWS, TILES_PER_BAND, _ctz32
from vpt_tpu.accel.traverse import T_MAX, T_MIN
from vpt_tpu.accel.visit_kernel import GROUP_SIZE, N_SUB


def _occlude_kernel(
    t_min: float,
    sub: int,          # triangles per sub-block (= K / N_SUB)
    instanced: bool,
    tiles: int,        # supertiles per band
    # per-band SMEM tables
    ngrp_ref,          # (1,1,1) i32
    order_ref,         # (1,1,Gp) i32 — entry-sorted candidate group ids
    entry_ref,         # (1,1,Gp) f32 — sorted entry distances (inf padded)
    bits_ref,          # (1,1,G) u32 — supertile mask, indexed by GROUP ID
    sent_ref,          # (1,1,T*Gp) f32 — per-(supertile, group) entry
    # per-band VMEM ray blocks (T, 8, 128)
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    act_ref,           # i32: 1 = active
    extri_ref,         # i32: virtual triangle id to ignore (-1 = none)
    # global SMEM cluster tables
    cab_ref,           # (1, 6C) f32 world AABBs
    cnt_ref,           # (1, C) i32
    base_ref,          # (1, C) i32 virtual tri base
    inst_ref,          # (1, C) i32 instance id
    inv_ref,           # (1, 12*n_inst) f32 world->local affines
    gblk_ref,          # (1, G) i32 — first member block row per group
    tris_ref,          # HBM (B, K/8 + 8, 128) — manual DMA
    # outputs (T, 8, 128)
    blocked_out,       # i32: 1 = blocked
    # scratch
    invx, invy, invz,  # (T, 8, 128) VMEM: per-band reciprocal dirs
    undone,            # (T,) i32 SMEM: supertile has unresolved rays
    tcaps,             # (T,) f32 SMEM: max live-ray tmax per supertile
    gbuf,              # (2, GROUP_SIZE, K/8 + 8, 128) VMEM: double-buffered group blocks
    gsem,              # (2,) DMA semaphores (double buffer)
):
    blocked_out[...] = jnp.zeros(blocked_out.shape, jnp.int32)

    ng = ngrp_ref[0, 0, 0]
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    invx[...] = 1.0 / jnp.where(jnp.abs(dx_ref[...]) > 1e-20, dx_ref[...], 1e-20)
    invy[...] = 1.0 / jnp.where(jnp.abs(dy_ref[...]) > 1e-20, dy_ref[...], 1e-20)
    invz[...] = 1.0 / jnp.where(jnp.abs(dz_ref[...]) > 1e-20, dz_ref[...], 1e-20)

    def _member_enter(cid, j):
        """World-space member-cluster slab for supertile j (any-hit live
        mask: active and not yet blocked)."""
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])
        live = (act_ref[j] > 0) & (blocked_out[j] == 0)
        inv8 = (invx[j], invy[j], invz[j])
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(live, tmax_ref[j], t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & live

    def _visit_rows(cid, src, sidx, j, rbits, enter):
        """Row-gated sub-slab + any-hit MT for one member cluster."""
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])
        d8 = (dx_ref[j], dy_ref[j], dz_ref[j])
        inv8 = (invx[j], invy[j], invz[j])
        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]
        blk = src[sidx]
        meta = src[sidx, sub : sub + N_SUB]

        if instanced:
            i12 = inst_ref[0, cid] * 12
            T = [inv_ref[0, i12 + k] for k in range(12)]
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

        # Row dispatch mirrors the stream kernel: rbits arrive precomputed
        # (batched group pass, no per-member drain) — only entering rows
        # pay the (8 subs, 128) sub-AABB slab.
        box_lo = [meta[:, ax : ax + 1] for ax in range(3)]
        box_hi = [meta[:, 3 + ax : 4 + ax] for ax in range(3)]
        siota = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, 1), 0)
        for r in range(SUPER_ROWS):

            @pl.when(((rbits >> r) & 1) != 0)
            def _row(r=r):
                er = enter[r : r + 1, :]
                ro_r = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                ri_r = (linv_x[r : r + 1], linv_y[r : r + 1],
                        linv_z[r : r + 1])
                stn = jnp.full((N_SUB, 128), t_min, jnp.float32)
                stf = jnp.where(er, tmax_ref[j, r : r + 1, :], t_min)
                for ax in range(3):
                    lo_t = (box_lo[ax] - ro_r[ax]) * ri_r[ax]
                    hi_t = (box_hi[ax] - ro_r[ax]) * ri_r[ax]
                    stn = jnp.maximum(stn, jnp.minimum(lo_t, hi_t))
                    stf = jnp.minimum(stf, jnp.maximum(lo_t, hi_t))
                s_ent_r = (stn <= stf) & er
                if _MT_DENSE:
                    # Dense mode (see stream.py): every sub-block's MT runs
                    # masked by the vector enter mask — no per-row sbits
                    # vector->scalar drain.
                    sbits = None
                else:
                    sbits = jnp.sum(
                        jnp.max(
                            jnp.where(
                                s_ent_r, jnp.int32(1) << siota, jnp.int32(0)
                            ),
                            axis=1, keepdims=True,
                        )
                    )
                for s in range(N_SUB):

                    def _mt(s=s, r=r, s_ent_r=s_ent_r):
                        c0 = s * 16
                        ro = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                        rd = (ldx[r : r + 1], ldy[r : r + 1], ldz[r : r + 1])
                        tm = tmax_ref[j, r : r + 1, :]
                        sub_enter = s_ent_r[s : s + 1, :]

                        def col(kk):
                            return blk[0:sub, c0 + kk : c0 + kk + 1]

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
                        tri_idx = idx0[:sub] + s * sub
                        gid = base + tri_idx                      # (sub, 128)
                        valid = (
                            (jnp.abs(det) > 1e-12)
                            & (uu >= 0.0)
                            & (vv >= 0.0)
                            & (uu + vv <= 1.0)
                            & (tt > t_min)
                            & (tt < tm)
                            & (tri_idx < cnt)
                            & sub_enter
                            & (gid != extri_ref[j, r : r + 1, :])
                        )
                        newly = jnp.max(
                            valid.astype(jnp.int32), axis=0, keepdims=True
                        )  # (1, 128)
                        blocked_out[j, r : r + 1, :] = (
                            blocked_out[j, r : r + 1, :] | newly
                        )

                    if _MT_DENSE:
                        _mt()
                    else:
                        pl.when(((sbits >> s) & 1) != 0)(_mt)

    def _visit_group_supertile(c0, src, j):
        """All GROUP_SIZE members of one candidate group against
        supertile j: a vector-only pass packs every member's row-any bits
        (one drain per 4 members, see stream.py), then only members with
        bits run the row-gated sub-slab + MT, and the supertile retires
        once per GROUP visit instead of once per member."""
        riota = jax.lax.broadcasted_iota(jnp.int32, (SUPER_ROWS, 1), 0)
        words = []
        for w0 in range(0, GROUP_SIZE, 4):
            acc = jnp.zeros((SUPER_ROWS, 1), jnp.int32)
            for mw in range(min(4, GROUP_SIZE - w0)):
                cid = c0 + w0 + mw
                enter = _member_enter(cid, j)
                row_any = jnp.max(
                    enter.astype(jnp.int32), axis=1, keepdims=True
                )
                occupied = jnp.where(
                    cnt_ref[0, cid] > 0, jnp.int32(1), jnp.int32(0)
                )
                acc = acc + jnp.where(
                    row_any > 0,
                    jnp.int32(1) << (riota + 8 * mw),
                    jnp.int32(0),
                ) * occupied
            words.append(jnp.sum(acc))

        any_bits = words[0]
        for wv in words[1:]:
            any_bits = any_bits | wv
        for m in range(GROUP_SIZE):
            byte = (words[m // 4] >> (8 * (m % 4))) & 0xFF

            @pl.when(byte != 0)
            def _m(m=m, byte=byte):
                cid = c0 + m
                enter = _member_enter(cid, j)
                _visit_rows(cid, src, m, j, byte, enter)

        # Retire the supertile once every live ray is blocked, and shrink
        # its tmax cap to the surviving rays so the entry screens tighten.
        @pl.when(any_bits != 0)
        def _retire():
            live_now = (act_ref[j] > 0) & (blocked_out[j] == 0)
            undone[j] = jnp.max(live_now.astype(jnp.int32))
            tcaps[j] = jnp.max(jnp.where(live_now, tmax_ref[j], t_min))

    def _visit_group(c0, src, word, g):
        gp_w = order_ref.shape[2]

        def body(w):
            j = _ctz32(w)

            @pl.when((undone[j] > 0) & (sent_ref[0, 0, j * gp_w + g] <= tcaps[j]))
            def _go():
                _visit_group_supertile(c0, src, j)

            return w & (w - jnp.uint32(1))

        jax.lax.while_loop(lambda w: w != jnp.uint32(0), body, word)

    for t in range(tiles):
        live_t = act_ref[t] > 0
        undone[t] = jnp.max(live_t.astype(jnp.int32))
        tcaps[t] = jnp.max(jnp.where(live_t, tmax_ref[t], t_min))

    def cond(state):
        return state[1]

    # Double-buffered group DMA (see stream.py): prefetch group gi+1 while
    # visiting gi — in-dispatch, synchronous per-group start+wait stalls on
    # DMA contention from the copies XLA schedules around the kernel.
    def _start_fetch(gi_val):
        g = order_ref[0, 0, gi_val]
        slot = jax.lax.rem(gi_val, 2)
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(gblk_ref[0, g], GROUP_SIZE)],
            gbuf.at[slot], gsem.at[slot],
        ).start()

    def _wait_fetch(gi_val):
        g = order_ref[0, 0, gi_val]
        slot = jax.lax.rem(gi_val, 2)
        pltpu.make_async_copy(
            tris_ref.at[pl.ds(gblk_ref[0, g], GROUP_SIZE)],
            gbuf.at[slot], gsem.at[slot],
        ).wait()

    @pl.when(ng > 0)
    def _prime():
        _start_fetch(jnp.int32(0))

    def body(state):
        gi, _ = state
        g = order_ref[0, 0, gi]
        word = bits_ref[0, 0, g]
        c0 = g * GROUP_SIZE
        gi2 = gi + 1

        @pl.when(gi2 < ng)
        def _prefetch():
            _start_fetch(gi2)

        _wait_fetch(gi)
        slot = jax.lax.rem(gi, 2)

        @pl.when(word != jnp.uint32(0))
        def _grp():
            _visit_group(c0, gbuf.at[slot], word, g)

        # Exit when no supertile has unresolved rays, or when the next
        # entry exceeds every unresolved supertile's tmax cap (scalar
        # loops over SMEM, no vector reductions).
        any_undone = undone[0]
        cap = jnp.where(undone[0] > 0, tcaps[0], t_min)
        for t in range(1, tiles):
            any_undone = jnp.maximum(any_undone, undone[t])
            cap = jnp.maximum(cap, jnp.where(undone[t] > 0, tcaps[t], t_min))
        nxt = entry_ref[0, 0, jnp.minimum(gi2, jnp.maximum(ng - 1, 0))]
        return gi2, (gi2 < ng) & (any_undone > 0) & (nxt < cap)

    gi_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), ng > 0))

    @pl.when((ng > 0) & (gi_final < ng))
    def _drain():
        _wait_fetch(gi_final)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def occlude_pallas(
    ngrp,           # (B,) i32
    order,          # (B, Gp) i32
    entry_sorted,   # (B, Gp) f32
    bits,           # (B, G) uint32
    sent,           # (B, T*Gp) f32
    ox, oy, oz,     # (B, T, 8, 128) f32
    dx, dy, dz,
    tmax,           # (B, T, 8, 128) f32
    act,            # (B, T, 8, 128) i32
    extri,          # (B, T, 8, 128) i32
    cluster_aabbs,  # (C, 6) f32
    cnt, base, inst,  # (C,) i32
    inv_rows,       # (n_inst, 12) f32
    group_blk0,     # (G,) i32
    tris_rk,        # (Bk, K/8 + 8, 128) f32
    t_min: float = 1e-4,
    interpret: bool = False,
):
    b, gp = order.shape
    g = bits.shape[1]
    t = ox.shape[1]
    c = cnt.shape[0]
    n_inst = inv_rows.shape[0]
    rows = tris_rk.shape[1]
    sub = rows - N_SUB
    instanced = n_inst > 1

    kernel = functools.partial(_occlude_kernel, t_min, sub, instanced, t)
    ray_spec = pl.BlockSpec(
        (None, t, SUPER_ROWS, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def smem_band(w):
        return pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    def smem_glob(w):
        return pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.SMEM)

    blocked = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            smem_band(1),      # ngrp
            smem_band(gp),     # order
            smem_band(gp),     # entry
            smem_band(g),      # bits
            smem_band(t * gp),  # sent
            ray_spec, ray_spec, ray_spec,   # o
            ray_spec, ray_spec, ray_spec,   # d
            ray_spec,          # tmax
            ray_spec,          # act
            ray_spec,          # extri
            smem_glob(6 * c),  # cab
            smem_glob(c),      # cnt
            smem_glob(c),      # base
            smem_glob(c),      # inst
            smem_glob(12 * n_inst),  # inv
            smem_glob(g),      # gblk0
            pl.BlockSpec(memory_space=pltpu.HBM),  # tris (manual DMA)
        ],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, SUPER_ROWS, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.SMEM((t,), jnp.int32),
            pltpu.SMEM((t,), jnp.float32),
            pltpu.VMEM((2, GROUP_SIZE, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        ngrp.reshape(b, 1, 1),
        order.reshape(b, 1, gp),
        entry_sorted.reshape(b, 1, gp),
        bits.reshape(b, 1, g),
        sent.reshape(b, 1, t * gp),
        ox, oy, oz, dx, dy, dz,
        tmax, act, extri,
        cluster_aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c), base.reshape(1, c),
        inst.reshape(1, c),
        inv_rows.reshape(1, 12 * n_inst),
        group_blk0.reshape(1, g),
        tris_rk,
    )
    return blocked


def occlude_stream(
    origin,
    direction,
    cl: ClusterData,
    t_min=T_MIN,
    t_max=T_MAX,
    active=None,
    exclude_tri=None,
    interpret: bool = False,
):
    """(N,) bool: does any triangle with virtual id != exclude_tri
    intersect the ray in (t_min, t_max)?  The TPU analogue of the
    reference's shadow queries: sky-NEE occlusion (RTCommon.slang:47-84)
    with exclude_tri=-1, light-NEE visibility (ClosestHit.slang:169-176)
    with exclude_tri=sampled triangle id."""
    n_orig = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    if active is None:
        active = jnp.ones(n_orig, bool)
    if exclude_tri is None:
        exclude_tri = jnp.full(n_orig, -1, jnp.int32)

    tiles_pb = min(TILES_PER_BAND, max(1, -(-n_orig // (SUPER_ROWS * 128))))
    band = tiles_pb * SUPER_ROWS * 128
    pad = (-n_orig) % band
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, jnp.float32)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        tmax_arr = jnp.concatenate([tmax_arr, jnp.full(pad, t_min, jnp.float32)])
        active = jnp.concatenate([active, jnp.zeros(pad, bool)])
        exclude_tri = jnp.concatenate([exclude_tri, jnp.full(pad, -1, jnp.int32)])
    n = origin.shape[0]

    # Root-exit bound: a ray can't be blocked beyond its exit from the
    # scene root box, so tmax (and with it every slab tf) tightens.
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
    tmax_arr = jnp.where(active, tmax_arr, jnp.float32(t_min))

    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate(
        [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T

    # Sort key: FIRST entered group only (occlusion needs no second-level
    # coherence; one level instead of two) — Pallas envelope kernel
    # (accel/envelope.py) replacing the XLA (N, G) slab + argmin chain.
    key = envelope.ray_keys(
        origin, inv_all, tmax_arr, gmin_pad, gmax_pad,
        t_min=float(t_min), levels=1, interpret=interpret,
    )
    key = jnp.where(active, key, jnp.int32(g_padded))

    lane = jax.lax.iota(jnp.int32, n)
    (key_s, lane_key, ox, oy, oz, dxs, dys, dzs, tmax_s, act_s, ext_s) = jax.lax.sort(
        (key, lane, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         tmax_arr, active.astype(jnp.int32), exclude_tri),
        num_keys=1, is_stable=True,
    )

    b = n // band
    o_s = jnp.stack([ox, oy, oz], axis=-1)
    d_s = jnp.stack([dxs, dys, dzs], axis=-1)
    inv_s = 1.0 / jnp.where(jnp.abs(d_s) > 1e-20, d_s, 1e-20)
    tm_eff = jnp.where(act_s > 0, tmax_s, jnp.float32(t_min))
    st_entry = envelope.supertile_tables(
        o_s, inv_s, tm_eff, gmin_pad, gmax_pad,
        t_min=float(t_min), interpret=interpret,
    )  # (S, Gp) min entry, +inf = no ray enters
    st_any = jnp.isfinite(st_entry)

    shifts = jnp.arange(tiles_pb, dtype=jnp.uint32)
    bits = jnp.sum(
        st_any.reshape(b, tiles_pb, g_padded).astype(jnp.uint32)
        << shifts[None, :, None],
        axis=1,
        dtype=jnp.uint32,
    )
    entry_bg = jnp.min(st_entry.reshape(b, tiles_pb, g_padded), axis=1)
    sent = st_entry.reshape(b, tiles_pb * g_padded)
    gids = jnp.broadcast_to(
        jnp.arange(g_padded, dtype=jnp.int32)[None, :], (b, g_padded)
    )
    entry_sorted, order = jax.lax.sort((entry_bg, gids), dimension=1, num_keys=1)
    ngrp = jnp.sum(jnp.isfinite(entry_bg), axis=1).astype(jnp.int32)

    shape4 = (b, tiles_pb, SUPER_ROWS, 128)
    blk = occlude_pallas(
        ngrp, order, entry_sorted, bits[:, :g], sent,
        ox.reshape(shape4), oy.reshape(shape4), oz.reshape(shape4),
        dxs.reshape(shape4), dys.reshape(shape4), dzs.reshape(shape4),
        tmax_s.reshape(shape4), act_s.reshape(shape4), ext_s.reshape(shape4),
        cl.aabbs, cl.count, cl.start,
        cl.inst, cl.inv_rows, cl.group_blk0, cl.tris_rk,
        t_min=float(t_min), interpret=interpret,
    )
    blk = blk.reshape(n)
    (_, blk_u) = jax.lax.sort((lane_key, blk), num_keys=1, is_stable=True)
    if pad:
        blk_u = blk_u[:n_orig]
    return blk_u > 0
