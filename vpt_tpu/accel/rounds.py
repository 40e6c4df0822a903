"""Round-based dense-row intersection — per-ray front-to-back traversal.

The cluster-major stream kernel (vpt_tpu.accel.stream) fixed the DMA count
but still runs Moller-Trumbore on supertile rows where only ~20% of lanes
enter the cluster being visited (a 1024-ray supertile's incidences spread
over every group its rays touch).  This module makes the rows DENSE by
construction, with a scheme that mirrors what per-ray front-to-back BVH
traversal does on GPUs (RTCommon.slang:47-84) using only sorts and dense
vector work:

  round k (k = 0..r_cap-1):
    1. per ray, pick the NEXT entered group: the (entry, group-id)
       lexicographic minimum strictly greater than the previous round's
       pick, skipping groups whose entry >= the ray's current best hit —
       i.e. exact per-ray front-to-back order with exact early exit.
       One fused elementwise pass over a precomputed (N, G) entry table.
    2. sort rays by that single group id — every 128-lane row now wants
       triangle tests against ONE group, so MT lane fill is ~100%.
    3. kernel: per band, walk the run list (distinct groups, ascending,
       with their supertile spans); per member cluster: one DMA, dense
       (8, 128) slab refinement, MT only on entering rows.
    4. unsort hits, fold into the per-ray running best.
  after r_cap rounds, rays that still have untested groups closer than
  their best hit (a few percent) fall back to the stream kernel with
  their tightened per-ray t_max — semantics stay exact.

Any-hit rays (shadow queries) stop producing candidates once any hit is
found.  Closest-hit ordering matches TraceRay exactly; see
tests/test_rounds_kernel.py for the parity gates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vpt_tpu.accel.cluster import ClusterData, _slab_tn_tf
from vpt_tpu.accel.traverse import Hit, T_MAX, T_MIN
from vpt_tpu.accel.visit_kernel import GROUP_SIZE, N_SUB
from vpt_tpu.accel.stream import intersect_stream, SUPER_ROWS, TILES_PER_BAND

R_CAP = int(os.environ.get("VPT_ROUNDS", "2"))
# Measurement-only: skip the exactness fallback to time the rounds part in
# isolation (renders may miss deep hits — never ship with this set).
_FALLBACK = os.environ.get("VPT_ROUNDS_FALLBACK", "1") == "1"
_SENT = jnp.int32(1 << 30)


def _rounds_kernel(
    t_min: float,
    sub: int,            # triangles per sub-block (= K / N_SUB)
    instanced: bool,
    # per-band SMEM run tables
    nrun_ref,            # (1,1,1) i32 — runs in this band
    rung_ref,            # (1,1,Gp) i32 — ascending distinct group ids
    t0_ref,              # (1,1,Gp) i32 — first supertile of the run
    t1_ref,              # (1,1,Gp) i32 — last supertile (inclusive)
    # per-band VMEM ray blocks (T, 8, 128)
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    bt_ref,              # f32 per-ray current best (= kernel t_max)
    gk_ref,              # i32 per-ray assigned group (sentinel when idle)
    # global SMEM cluster tables
    cab_ref,             # (1, 6C) f32 world AABBs
    cnt_ref,             # (1, C) i32
    base_ref,            # (1, C) i32 virtual tri base
    blk_ref,             # (1, C) i32 block row
    inst_ref,            # (1, C) i32 instance id
    inv_ref,             # (1, 12*n_inst) f32 world->local affines
    tris_ref,            # HBM (B, K/8 + 8, 128) — manual DMA
    # outputs (T, 8, 128)
    t_out, tri_out, u_out, v_out,
    # scratch
    buf,                 # (rows, 128) VMEM triangle block
    sem,                 # DMA semaphore
    invx, invy, invz,    # (T, 8, 128) reciprocal directions
    emask,               # (T, 8, 128) i32 refine enter masks
):
    t_out[...] = bt_ref[...]
    tri_out[...] = jnp.full(tri_out.shape, -1, jnp.int32)
    u_out[...] = jnp.zeros(u_out.shape, jnp.float32)
    v_out[...] = jnp.zeros(v_out.shape, jnp.float32)

    invx[...] = 1.0 / jnp.where(jnp.abs(dx_ref[...]) > 1e-20, dx_ref[...], 1e-20)
    invy[...] = 1.0 / jnp.where(jnp.abs(dy_ref[...]) > 1e-20, dy_ref[...], 1e-20)
    invz[...] = 1.0 / jnp.where(jnp.abs(dz_ref[...]) > 1e-20, dz_ref[...], 1e-20)

    nr = nrun_ref[0, 0, 0]
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    def _member_enter(g, cid, t):
        """(8,128): supertile t's rays assigned to group g that enter member
        cluster `cid`'s world AABB before their current best."""
        mine = gk_ref[t] == g
        o8 = (ox_ref[t], oy_ref[t], oz_ref[t])
        inv8 = (invx[t], invy[t], invz[t])
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(mine, t_out[t], t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & mine

    def _process_supertile(cid, t):
        """Sub-AABB + MT on rows of supertile t entering cluster `cid`
        (block resident in buf); er comes from the refine pass' emask."""
        enter = emask[t] > 0
        o8 = (ox_ref[t], oy_ref[t], oz_ref[t])
        d8 = (dx_ref[t], dy_ref[t], dz_ref[t])
        bt8 = t_out[t]
        tri8 = tri_out[t]

        cnt = cnt_ref[0, cid]
        base = base_ref[0, cid]
        meta = buf[sub : sub + N_SUB]  # (8,128): row s lanes 0:6 = sub AABB

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
            linv_x, linv_y, linv_z = invx[t], invy[t], invz[t]

        for r in range(SUPER_ROWS):
            er = enter[r : r + 1, :]  # (1, 128)

            @pl.when(jnp.any(er))
            def _row(r=r, er=er):
                ro = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                rd = (ldx[r : r + 1], ldy[r : r + 1], ldz[r : r + 1])
                ri = (linv_x[r : r + 1], linv_y[r : r + 1], linv_z[r : r + 1])
                best_t = bt8[r : r + 1, :]
                best_tri = tri8[r : r + 1, :]
                best_u = u_out[t, r : r + 1, :]
                best_v = v_out[t, r : r + 1, :]
                for s in range(N_SUB):
                    stn = jnp.full((1, 128), t_min, jnp.float32)
                    stf = jnp.where(er, best_t, t_min)
                    for ax in range(3):
                        lo = meta[s : s + 1, ax : ax + 1]
                        hi = meta[s : s + 1, 3 + ax : 4 + ax]
                        s0 = (lo - ro[ax]) * ri[ax]
                        s1 = (hi - ro[ax]) * ri[ax]
                        stn = jnp.maximum(stn, jnp.minimum(s0, s1))
                        stf = jnp.minimum(stf, jnp.maximum(s0, s1))
                    sub_enter = (stn <= stf) & er
                    c0 = s * 16

                    def col(kk):
                        return buf[0:sub, c0 + kk : c0 + kk + 1]  # (sub, 1)

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
                    u_best = jnp.sum(jnp.where(pick, uu, 0.0), axis=0, keepdims=True)
                    v_best = jnp.sum(jnp.where(pick, vv, 0.0), axis=0, keepdims=True)
                    better = t_best < best_t
                    best_t = jnp.where(better, t_best, best_t)
                    best_tri = jnp.where(better, base + s * sub + jj, best_tri)
                    best_u = jnp.where(better, u_best, best_u)
                    best_v = jnp.where(better, v_best, best_v)

                t_out[t, r : r + 1, :] = best_t
                tri_out[t, r : r + 1, :] = best_tri
                u_out[t, r : r + 1, :] = best_u
                v_out[t, r : r + 1, :] = best_v

    def run_body(i, _):
        g = rung_ref[0, 0, i]
        ts0 = t0_ref[0, 0, i]
        ts1 = t1_ref[0, 0, i]
        for m in range(GROUP_SIZE):
            cid = g * GROUP_SIZE + m

            @pl.when(cnt_ref[0, cid] > 0)
            def _m(cid=cid):
                # Refine pass over the run's supertiles — stash per-row
                # enter masks, skip the DMA when nothing enters the member.
                def rbody(c):
                    t, anyf = c
                    ent8 = _member_enter(g, cid, t)
                    emask[t] = ent8.astype(jnp.int32)
                    return t + 1, anyf | jnp.any(ent8).astype(jnp.int32)

                _, anyf = jax.lax.while_loop(
                    lambda c: c[0] <= ts1, rbody, (ts0, jnp.int32(0))
                )

                @pl.when(anyf > 0)
                def _go():
                    pltpu.make_async_copy(
                        tris_ref.at[blk_ref[0, cid]], buf, sem
                    ).start()
                    pltpu.make_async_copy(
                        tris_ref.at[blk_ref[0, cid]], buf, sem
                    ).wait()

                    def pbody(t):
                        @pl.when(jnp.any(emask[t] > 0))
                        def _tile():
                            _process_supertile(cid, t)
                        return t + 1

                    jax.lax.while_loop(lambda t: t <= ts1, pbody, ts0)
        return 0

    jax.lax.fori_loop(0, nr, run_body, 0)


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def rounds_pallas(
    nrun,            # (B,) i32
    rung,            # (B, Gp) i32
    run_t0,          # (B, Gp) i32
    run_t1,          # (B, Gp) i32
    ox, oy, oz,      # (B, T, 8, 128) f32
    dx, dy, dz,
    bt,              # (B, T, 8, 128) f32 per-ray current best (t_max)
    gk,              # (B, T, 8, 128) i32 assigned group id
    cluster_aabbs,   # (C, 6) f32
    cnt, base, block_id, inst,  # (C,) i32
    inv_rows,        # (n_inst, 12) f32
    tris_rk,         # (Bk, K/8 + 8, 128) f32
    t_min: float = 1e-4,
    interpret: bool = False,
):
    b, gp = rung.shape
    t = ox.shape[1]
    c = cnt.shape[0]
    n_inst = inv_rows.shape[0]
    rows = tris_rk.shape[1]
    sub = rows - N_SUB
    instanced = n_inst > 1

    kernel = functools.partial(_rounds_kernel, t_min, sub, instanced)
    ray_spec = pl.BlockSpec(
        (None, t, SUPER_ROWS, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    shape4 = jax.ShapeDtypeStruct((b, t, SUPER_ROWS, 128), jnp.float32)
    shape4i = jax.ShapeDtypeStruct((b, t, SUPER_ROWS, 128), jnp.int32)

    def smem_band(w):
        return pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)

    def smem_glob(w):
        return pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.SMEM)

    t_o, tri_o, u_o, v_o = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            smem_band(1),       # nrun
            smem_band(gp),      # rung
            smem_band(gp),      # run_t0
            smem_band(gp),      # run_t1
            ray_spec, ray_spec, ray_spec,  # o
            ray_spec, ray_spec, ray_spec,  # d
            ray_spec,           # bt
            ray_spec,           # gk
            smem_glob(6 * c),   # cab
            smem_glob(c),       # cnt
            smem_glob(c),       # base
            smem_glob(c),       # blk
            smem_glob(c),       # inst
            smem_glob(12 * n_inst),  # inv
            pl.BlockSpec(memory_space=pltpu.HBM),  # tris (manual DMA)
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[shape4, shape4i, shape4, shape4],
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        nrun.reshape(b, 1, 1),
        rung.reshape(b, 1, gp),
        run_t0.reshape(b, 1, gp),
        run_t1.reshape(b, 1, gp),
        ox, oy, oz, dx, dy, dz, bt, gk,
        cluster_aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c), base.reshape(1, c), block_id.reshape(1, c),
        inst.reshape(1, c),
        inv_rows.reshape(1, 12 * n_inst),
        tris_rk,
    )
    return t_o, tri_o, u_o, v_o


def intersect_rounds(
    origin,
    direction,
    cl: ClusterData,
    t_min=T_MIN,
    t_max=T_MAX,
    active=None,
    anyhit=None,
    r_cap: int = R_CAP,
    interpret: bool = False,
) -> Hit:
    """Closest-hit (or per-ray any-hit) wavefront intersection via dense
    per-round traversal + stream-kernel fallback.  Drop-in replacement for
    intersect_stream."""
    n_orig = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    if active is None:
        active = jnp.ones(n_orig, bool)
    if anyhit is None:
        anyhit = jnp.zeros(n_orig, bool)

    tiles_pb = min(TILES_PER_BAND, max(1, -(-n_orig // (SUPER_ROWS * 128))))
    band = tiles_pb * SUPER_ROWS * 128
    pad = (-n_orig) % band
    orig_in, dir_in, act_in, ah_in = origin, direction, active, anyhit
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e9, jnp.float32)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        tmax_arr = jnp.concatenate([tmax_arr, jnp.full(pad, t_min, jnp.float32)])
        active = jnp.concatenate([active, jnp.zeros(pad, bool)])
        anyhit = jnp.concatenate([anyhit, jnp.zeros(pad, bool)])
    n = origin.shape[0]
    b = n // band

    # Root-exit bound (see intersect_clusters).
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

    # One (N, Gp) entry table, reused by every round: entry distance into
    # each group box, inf when not entered before the ray's initial t_max.
    # (Tighter per-round bounds are applied by masking against the running
    # best, so this never needs recomputing.)
    pk = SUPER_ROWS * 128
    tn0, tf0 = _slab_tn_tf(
        origin.reshape(n // pk, pk, 3),
        direction.reshape(n // pk, pk, 3),
        tmax_arr.reshape(n // pk, pk), gmin_pad, gmax_pad, t_min,
    )
    ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)

    gid_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
    lane_ids = jax.lax.iota(jnp.int32, n)
    si_band = (jnp.arange(band, dtype=jnp.int32) // pk)[None, :]  # (1, band)
    shape4 = (b, tiles_pb, SUPER_ROWS, 128)
    BIG_I = jnp.int32(1 << 30)

    def next_candidate(bt, btri, pe, pg):
        """Per-ray (entry, gid) lexicographic min strictly after (pe, pg),
        below the running best; sentinel when exhausted/done."""
        ah_done = anyhit & (btri >= 0)
        prog = (ent > pe[:, None]) | ((ent == pe[:, None]) & (gid_row > pg[:, None]))
        cand = prog & (ent < bt[:, None]) & active[:, None] & (~ah_done)[:, None]
        e2 = jnp.where(cand, ent, jnp.inf)
        ek = jnp.min(e2, axis=1)
        gk = jnp.min(
            jnp.where(e2 == ek[:, None], gid_row, g_padded), axis=1
        ).astype(jnp.int32)
        live = jnp.isfinite(ek)
        return ek, gk, live

    def round_body(carry):
        i, bt, btri, bu, bv, pe, pg, _ = carry
        ek, gk, live = next_candidate(bt, btri, pe, pg)
        key = jnp.where(live, gk, _SENT)

        (key_s, lane_s, ox, oy, oz, dxs, dys, dzs, bt_s) = jax.lax.sort(
            (key, lane_ids, origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2], bt),
            num_keys=1, is_stable=True,
        )

        # Run tables: distinct group per band with its supertile span.
        ks_b = key_s.reshape(b, band)
        eq = ks_b[:, :, None] == gid_row[None, :, :]          # (B, band, Gp)
        cntg = jnp.sum(eq, axis=1)
        smin = jnp.min(jnp.where(eq, si_band[:, :, None], BIG_I), axis=1)
        smax = jnp.max(jnp.where(eq, si_band[:, :, None], -1), axis=1)
        present = cntg > 0
        runkey = jnp.where(present, jnp.broadcast_to(gid_row, (b, g_padded)), BIG_I)
        rung, t0s, t1s = jax.lax.sort(
            (runkey, smin.astype(jnp.int32), smax.astype(jnp.int32)),
            dimension=1, num_keys=1,
        )
        nrun = jnp.sum(present, axis=1).astype(jnp.int32)

        kt, ktri, ku, kv = rounds_pallas(
            nrun, rung, t0s, t1s,
            ox.reshape(shape4), oy.reshape(shape4), oz.reshape(shape4),
            dxs.reshape(shape4), dys.reshape(shape4), dzs.reshape(shape4),
            bt_s.reshape(shape4), key_s.reshape(shape4),
            cl.aabbs, cl.count, cl.start, cl.block_id, cl.inst, cl.inv_rows,
            cl.tris_rk,
            t_min=float(t_min), interpret=interpret,
        )
        (_, t_u, tri_u, u_u, v_u) = jax.lax.sort(
            (lane_s, kt.reshape(n), ktri.reshape(n), ku.reshape(n), kv.reshape(n)),
            num_keys=1, is_stable=True,
        )
        better = (tri_u >= 0) & (t_u < bt)
        bt = jnp.where(better, t_u, bt)
        btri = jnp.where(better, tri_u, btri)
        bu = jnp.where(better, u_u, bu)
        bv = jnp.where(better, v_u, bv)
        pe = jnp.where(live, ek, pe)
        pg = jnp.where(live, gk, pg)

        _, _, live2 = next_candidate(bt, btri, pe, pg)
        return i + 1, bt, btri, bu, bv, pe, pg, jnp.any(live2)

    init = (
        jnp.int32(0),
        tmax_arr,
        jnp.full(n, -1, jnp.int32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.full(n, -jnp.inf, jnp.float32),
        jnp.full(n, -1, jnp.int32),
        jnp.bool_(True),
    )
    _, bt, btri, bu, bv, pe, pg, _ = jax.lax.while_loop(
        lambda c: (c[0] < r_cap) & c[7], round_body, init
    )

    # Fallback: rays with untested groups still closer than their best go
    # through the stream kernel with the tightened per-ray bound.  (It may
    # re-test already-visited groups; closest/any-hit folds are idempotent.)
    _, _, live_f = next_candidate(bt, btri, pe, pg)
    bt_t, btri_t, bu_t, bv_t = (a[:n_orig] for a in (bt, btri, bu, bv))
    live_t = live_f[:n_orig]

    def run_fallback(_):
        fb = intersect_stream(
            orig_in, dir_in, cl, t_min=t_min, t_max=bt_t,
            active=live_t, anyhit=ah_in, interpret=interpret,
        )
        return fb.t, fb.tri, fb.u, fb.v

    def no_fallback(_):
        z = jnp.zeros(n_orig, jnp.float32)
        return (jnp.full(n_orig, -1.0, jnp.float32),
                jnp.full(n_orig, -1, jnp.int32), z, z)

    if _FALLBACK:
        ft, ftri, fu, fv = jax.lax.cond(
            jnp.any(live_t), run_fallback, no_fallback, operand=None
        )
    else:
        ft, ftri, fu, fv = no_fallback(None)
    better = (ftri >= 0) & (ft >= 0) & (ft < bt_t)
    bt_t = jnp.where(better, ft, bt_t)
    btri_t = jnp.where(better, ftri, btri_t)
    bu_t = jnp.where(better, fu, bu_t)
    bv_t = jnp.where(better, fv, bv_t)

    found = btri_t >= 0
    return Hit(
        t=jnp.where(found, bt_t, -1.0), tri=btri_t, u=bu_t, v=bv_t
    )
