"""Cluster-major streaming intersection — round-3 "RT core" redesign.

The packet-major visit kernel (vpt_tpu.accel.visit_kernel) wastes 10-17x
SIMD occupancy on incoherent bounces: a sorted 512-ray packet must march
the UNION of its rays' entered clusters (~40-76) while each ray only
enters ~4.5.  This module inverts the dispatch: the grid streams over ray
BANDS resident in VMEM, and within a band each candidate cluster's
triangle block is DMA'd ONCE and tested only against the 128-ray rows
that actually enter it:

  XLA side (per trace):
    1. sort rays by (first, second) entered group — rays needing the same
       cluster become row-adjacent,
    2. one fused slab pass over (ray, group) reduced to per-supertile
       tables: a uint32 "which 1024-ray supertiles enter group g" mask per
       band, plus per-band entry-sorted candidate group lists,
  kernel (grid = bands):
    for each candidate group (front-to-back, until entry > band cap):
      ONE fixed-size DMA fetches all GROUP_SIZE member blocks (a group's
      real members are consecutive tris_rk rows — see
      ClusterData.group_blk0), then for each member cluster: supertile-
      word refinement vs its own AABB; for each surviving supertile:
      (8,128) slab refinement -> batched (8,128) sub-AABB slabs ->
      (K/8, 128) Moller-Trumbore only on rows with live entering rays,
      row/sub dispatch driven by scalar bitmask tests (one vector->scalar
      sync per mask instead of one jnp.any pipeline sync per branch).

  Work scales with (ray, cluster) INCIDENCES instead of packet unions, and
  each triangle block moves HBM->VMEM once per band instead of once per
  visiting packet (~20x fewer DMAs on colonnade).

Round-3.5 additions (dense prologue + per-supertile caps):

  The supertile masks alone leave ~20% MT lane fill (a 1024-ray
  supertile's incidences spread over every group its rays touch) and the
  band candidate loop's per-visit orchestration (~3.4 us/supertile visit)
  runs even for rays that already found their hit.  Two changes make the
  hot path scale with *unfinished* incidences:

  - PHASE A (dense prologue): the sort key is the base-(gp+1) packing of
    each ray's first PROLOGUE entered groups, so level-l groups are
    row-contiguous after the sort.  Per band, per level, a run list
    (distinct group, supertile span) drives dense processing: every ray
    tests its own l-th group with ~full 128-lane rows, in per-ray
    front-to-back order (level order = entry order).  This usually finds
    the final hit and costs ~11 ms per level per 262K rays.
  - PHASE B keeps the candidate/bits tables (built EXCLUDING each ray's
    prologue groups) for whatever the prologue didn't finish, but screens
    every (supertile, group) visit against `caps` — per-supertile running
    max best-t over live rays, tightened after every processed supertile —
    using the per-(supertile, group) entry table `sent`.  A supertile
    whose rays are all done prunes at one SMEM compare per candidate,
    never touching the slab units.

Mixed per-ray semantics: an `anyhit` flag bit makes a ray stop improving
its hit after the first found intersection (shadow queries), so main +
sky-NEE + light-NEE rays share ONE sort/cull/launch per bounce.  Closest-
hit ordering matches the reference TraceRay (RTCommon.slang:47-117);
any-hit matches DoesRayIntersectWithAS.
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

_PIPELINED = os.environ.get("VPT_STREAM_PIPELINE", "0") == "1"
# Dense-prologue depth: each ray's first PROLOGUE entered groups (which the
# payload sort makes row-contiguous) are processed as per-band run lists
# with ~full 128-lane MT occupancy BEFORE the band candidate loop, and are
# excluded from the band tables.  1..3; 3 needs (gp+1)^3 < 2^31.
# 0 disables phase A entirely (empty run tables; the per-supertile caps
# screen stays on — it is phase-A-independent).  Device sweep on colonnade
# 512x4: depth0 ~1.2, depth1 1.14, depth2 1.09 M segs/s.
PROLOGUE = max(0, min(3, int(os.environ.get("VPT_PROLOGUE", "0"))))
# Rows per supertile: (SUPER_ROWS, 128) rays share one visit's scalar
# orchestration (~3 us) — bigger supertiles amortize it over more rays at
# the cost of a wider candidate union (lower MT fill).  Env-tunable for
# sweeps; 8 = one f32 vreg per block row.
SUPER_ROWS = int(os.environ.get("VPT_SUPER_ROWS", "8"))
TILES_PER_BAND = 32     # supertiles per band (= bits of the uint32 mask)
BAND = TILES_PER_BAND * SUPER_ROWS * 128  # 32768 rays

_FLAG_ACT = 1
_FLAG_ANYHIT = 2


def _ctz32(w):
    """Count trailing zeros of a nonzero uint32 scalar: branch-free binary
    search (Mosaic supports neither scalar bitcasts nor uint->float casts,
    so the classic float-exponent trick is unavailable)."""
    j = jnp.int32(0)
    for shift, mask in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        z = (w & jnp.uint32(mask)) == jnp.uint32(0)
        j = j + jnp.where(z, jnp.int32(shift), jnp.int32(0))
        w = jnp.where(z, w >> shift, w)
    return j


def _stream_kernel(
    t_min: float,
    sub: int,          # triangles per sub-block (= K / N_SUB)
    instanced: bool,
    pipelined: bool,
    depth: int,        # dense-prologue levels (1..3)
    tiles: int,        # supertiles per band (gk_ref level stride)
    # per-band SMEM tables (3D (1,1,W) blocks: TPU lowering requires the
    # last two block dims to equal the array dims for SMEM)
    pnrun_ref,         # (1,1,depth) i32 — prologue runs per level
    prun_ref,          # (1,1,depth*Gp) i32 — level-major run group ids
    pt0_ref,           # (1,1,depth*Gp) i32 — run first supertile
    pt1_ref,           # (1,1,depth*Gp) i32 — run last supertile (incl.)
    ngrp_ref,          # (1,1,1) i32 — candidate group count for this band
    order_ref,         # (1,1,Gp) i32 — entry-sorted candidate group ids
    entry_ref,         # (1,1,Gp) f32 — sorted entry distances (inf padded)
    bits_ref,          # (1,1,G) u32 — supertile mask, indexed by GROUP ID
    sent_ref,          # (1,1,T*Gp) f32 — per-(supertile, group) entry
    # per-band VMEM ray blocks (T, 8, 128)
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    flags_ref,         # i32: bit0 = active, bit1 = any-hit semantics
    gk_ref,            # (depth*T, 8, 128) i32 — per-ray level-l entered
    # group (level-major along dim 0); sentinel >= G when exhausted
    # global SMEM cluster tables
    cab_ref,           # (1, 6C) f32 world AABBs
    cnt_ref,           # (1, C) i32
    base_ref,          # (1, C) i32 virtual tri base
    blk_ref,           # (1, C) i32 block row
    inst_ref,          # (1, C) i32 instance id
    inv_ref,           # (1, 12*n_inst) f32 world->local affines
    gblk_ref,          # (1, G) i32 — first member's block row per group
    tris_ref,          # HBM (B, K/8 + 8, 128) — manual DMA
    # outputs (T, 8, 128)
    t_out, tri_out, u_out, v_out,
    # scratch
    buf,               # (2, K/8 + 8, 128) VMEM
    sem,               # (2,) DMA semaphores
    pend,              # (4,) i32 SMEM: [pending cid, slot, word_lo_bits, unused]
    pword,             # (1,) u32 SMEM: pending cluster's supertile word
    cap_ref,           # (1,) f32 SMEM: current band cap (max live best-t)
    invx, invy, invz,  # (T, 8, 128) VMEM scratch: per-band reciprocal dirs
    emask,             # (T, 8, 128) i32 VMEM scratch: refine's enter masks
    caps,              # (T,) f32 SMEM: per-supertile running best-t caps
    gbuf,              # (GROUP_SIZE, K/8 + 8, 128) VMEM: whole-group blocks
    gsem,              # DMA semaphore for the group copy
):
    t_out[...] = tmax_ref[...]
    tri_out[...] = jnp.full(tri_out.shape, -1, jnp.int32)
    u_out[...] = jnp.zeros(u_out.shape, jnp.float32)
    v_out[...] = jnp.zeros(v_out.shape, jnp.float32)

    ng = ngrp_ref[0, 0, 0]
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    # Reciprocal directions once per band — the slab tests otherwise paid
    # three vector divides per (member, supertile) visit, twice.
    invx[...] = 1.0 / jnp.where(jnp.abs(dx_ref[...]) > 1e-20, dx_ref[...], 1e-20)
    invy[...] = 1.0 / jnp.where(jnp.abs(dy_ref[...]) > 1e-20, dy_ref[...], 1e-20)
    invz[...] = 1.0 / jnp.where(jnp.abs(dz_ref[...]) > 1e-20, dz_ref[...], 1e-20)

    def band_cap():
        """Max best-t over live rays — the front-to-back early-exit bound.
        Any-hit rays that found a hit stop holding the cap up."""
        fl = flags_ref[...]
        live = ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri_out[...] < 0)
        )
        return jnp.max(jnp.where(live, t_out[...], t_min))

    def _supertile_enter(cid, j):
        """(8,128) cluster world-AABB slab for supertile j, tf bounded by
        each live ray's current best."""
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])      # (8, 128) each
        fl = flags_ref[j]
        bt8 = t_out[j]
        tri8 = tri_out[j]
        live = ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri8 < 0)
        )
        inv8 = (invx[j], invy[j], invz[j])
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(live, bt8, t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & live

    def _refine_word(cid, word, g):
        """Drop supertile bits whose rays don't enter cluster `cid`'s own
        AABB (the group word is the union over 8 members) — BEFORE the
        DMA, so members with no entering supertile skip HBM entirely.
        Each bit is first screened against the per-supertile running cap
        (sent_ref holds the supertile's entry into group g): after the
        dense prologue most supertiles' caps sit below every remaining
        entry, so the (8,128) slab work is skipped wholesale.
        Surviving supertiles' enter masks are stashed in `emask` for the
        triangle pass (valid because processing follows refinement for
        the same cluster in single-buffered mode)."""
        gp_w = order_ref.shape[2]

        def cond(c):
            return c[0] != jnp.uint32(0)

        def body(c):
            w, out = c
            lsb = w & (jnp.uint32(0) - w)
            j = _ctz32(w)
            pend[3] = jnp.int32(0)

            @pl.when(sent_ref[0, 0, j * gp_w + g] <= caps[j])
            def _screen():
                ent = _supertile_enter(cid, j)
                emask[j] = ent.astype(jnp.int32)
                pend[3] = jnp.any(ent).astype(jnp.int32)

            out = out | jnp.where(pend[3] > 0, lsb, jnp.uint32(0))
            return w & (w - jnp.uint32(1)), out

        return jax.lax.while_loop(cond, body, (word, jnp.uint32(0)))[1]

    def _process_supertile(cid, src, sidx, j, use_emask=False):
        """Run per-row sub-AABB + MT on rows entering cluster `cid` (block
        in src[sidx] — buf slot or gbuf member row)."""
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])      # (8, 128) each
        d8 = (dx_ref[j], dy_ref[j], dz_ref[j])
        enter = emask[j] > 0 if use_emask else _supertile_enter(cid, j)

        # One vector->scalar sync yields a row bitmask (bit r = any lane of
        # row r enters); the row loop then branches on cheap scalar bit
        # tests instead of SUPER_ROWS separate jnp.any pipeline syncs.
        rw = jax.lax.broadcasted_iota(jnp.int32, (SUPER_ROWS, 128), 0)
        rbits = jnp.sum(
            jnp.max(
                jnp.where(enter, jnp.int32(1) << rw, jnp.int32(0)),
                axis=1, keepdims=True,
            )
        )

        @pl.when(rbits != 0)
        def _go():
            cnt = cnt_ref[0, cid]
            base = base_ref[0, cid]
            blk = src[sidx]
            meta = src[sidx, sub : sub + N_SUB]  # (8,128): row s lanes 0:6 AABB

            # Instancing: mesh-local rays; direction left unnormalized so t
            # stays world-parametric (best-t merging across instances exact).
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
                linv_x, linv_y, linv_z = invx[j], invy[j], invz[j]

            sw = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, 128), 0)
            for r in range(SUPER_ROWS):
                er = enter[r : r + 1, :]  # (1, 128)

                @pl.when(((rbits >> r) & 1) != 0)
                def _row(r=r, er=er):
                    ro = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                    rd = (ldx[r : r + 1], ldy[r : r + 1], ldz[r : r + 1])
                    ri = (linv_x[r : r + 1], linv_y[r : r + 1], linv_z[r : r + 1])
                    # ALL 8 sub-AABB slabs of this row at once: meta's rows
                    # are the sub-blocks, so (8,1) box columns against the
                    # (1,128) ray row give every sub's interval in one
                    # (8,128) op per axis instead of 8 scalar-sliced passes.
                    bt0 = t_out[j, r : r + 1, :]
                    stn = jnp.full((N_SUB, 128), t_min, jnp.float32)
                    stf = jnp.where(er, bt0, t_min)
                    for ax in range(3):
                        lo = meta[:, ax : ax + 1]          # (8, 1)
                        hi = meta[:, 3 + ax : 4 + ax]
                        s0 = (lo - ro[ax]) * ri[ax]
                        s1 = (hi - ro[ax]) * ri[ax]
                        stn = jnp.maximum(stn, jnp.minimum(s0, s1))
                        stf = jnp.minimum(stf, jnp.maximum(s0, s1))
                    sub_enter8 = (stn <= stf) & er         # (8, 128)
                    sbits = jnp.sum(
                        jnp.max(
                            jnp.where(sub_enter8, jnp.int32(1) << sw, jnp.int32(0)),
                            axis=1, keepdims=True,
                        )
                    )
                    for s in range(N_SUB):
                        c0 = s * 16

                        # Gate the 32x128 Moller-Trumbore block on any lane
                        # entering the sub-AABB — a typical entering ray
                        # passes 2-4 of the 8 sub-boxes, so most blocks skip
                        # at one scalar bit test of the batched slab mask.
                        @pl.when(((sbits >> s) & 1) != 0)
                        def _sub(s=s):
                            # Bound by the CURRENT row best (re-read per
                            # sub-block so earlier sub-blocks' hits tighten
                            # later tests).
                            bt = t_out[j, r : r + 1, :]
                            sub_enter = sub_enter8[s : s + 1, :] & (bt >= stn[s : s + 1, :])
                            def col(kk):
                                return blk[0:sub, c0 + kk : c0 + kk + 1]  # (sub, 1)

                            # Moller-Trumbore (sub, 128): triangles in
                            # sublanes, rays in lanes — masked to the
                            # entering rows only.
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
                                & (tt < bt)
                                & (tri_idx < cnt)
                                & sub_enter
                            )
                            t_masked = jnp.where(valid, tt, jnp.inf)
                            t_best = jnp.min(t_masked, axis=0, keepdims=True)
                            # smallest-index tie-break down sublanes
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
                            better = t_best < bt
                            t_out[j, r : r + 1, :] = jnp.where(better, t_best, bt)
                            tri_out[j, r : r + 1, :] = jnp.where(
                                better, base + s * sub + jj, tri_out[j, r : r + 1, :]
                            )
                            u_out[j, r : r + 1, :] = jnp.where(
                                better, u_best, u_out[j, r : r + 1, :]
                            )
                            v_out[j, r : r + 1, :] = jnp.where(
                                better, v_best, v_out[j, r : r + 1, :]
                            )

            # Tighten the supertile's running cap with the new bests so the
            # per-(supertile, group) screen prunes later candidates.
            fl8 = flags_ref[j]
            tri_new = tri_out[j]
            live8 = ((fl8 & _FLAG_ACT) > 0) & (
                ((fl8 & _FLAG_ANYHIT) == 0) | (tri_new < 0)
            )
            caps[j] = jnp.max(jnp.where(live8, t_out[j], t_min))

    def _process_cluster(cid, src, sidx, word, use_emask=False):
        """Visit every supertile whose mask bit is set (ctz loop)."""
        def cond(w):
            return w != jnp.uint32(0)

        def body(w):
            j = _ctz32(w)
            _process_supertile(cid, src, sidx, j, use_emask=use_emask)
            return w & (w - jnp.uint32(1))

        jax.lax.while_loop(cond, body, word)

    # --- Phase A: dense prologue ------------------------------------------
    # The payload sort keyed on (first, second[, third]) entered groups made
    # each ray's level-l group row-contiguous; the per-band run tables list
    # the distinct level-l groups with their supertile spans.  Processing
    # them here, front-to-back per ray (level order = per-ray entry order),
    # runs MT on ~full 128-lane rows and seeds tight per-ray best-t bounds
    # before the band candidate loop — the slab tf bound then terminates
    # most rays without union-mask work.  Phase B's tables exclude these
    # per-ray groups, so nothing is visited twice on the same ray's behalf.
    def _mine_enter(l, g, cid, t):
        """(8,128): rays of supertile t whose level-l group is `g` that
        enter member cluster `cid` before their current best."""
        mine = gk_ref[l * tiles + t] == g
        fl = flags_ref[t]
        tri8 = tri_out[t]
        live = ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri8 < 0)
        )
        keep = mine & live
        o8 = (ox_ref[t], oy_ref[t], oz_ref[t])
        inv8 = (invx[t], invy[t], invz[t])
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(keep, t_out[t], t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & keep

    for l in range(depth):
        nr = pnrun_ref[0, 0, l]

        def prologue_run(i, _, l=l):
            g = prun_ref[0, 0, l * order_ref.shape[2] + i]
            ts0 = pt0_ref[0, 0, l * order_ref.shape[2] + i]
            ts1 = pt1_ref[0, 0, l * order_ref.shape[2] + i]
            for m in range(GROUP_SIZE):
                cid = g * GROUP_SIZE + m

                @pl.when(cnt_ref[0, cid] > 0)
                def _m(cid=cid, l=l, g=g, ts0=ts0, ts1=ts1):
                    def rbody(c):
                        t, anyf = c
                        ent8 = _mine_enter(l, g, cid, t)
                        emask[t] = ent8.astype(jnp.int32)
                        return t + 1, anyf | jnp.any(ent8).astype(jnp.int32)

                    _, anyf = jax.lax.while_loop(
                        lambda c: c[0] <= ts1, rbody, (ts0, jnp.int32(0))
                    )

                    @pl.when(anyf > 0)
                    def _go():
                        pltpu.make_async_copy(
                            tris_ref.at[blk_ref[0, cid]], buf.at[0], sem.at[0]
                        ).start()
                        pltpu.make_async_copy(
                            tris_ref.at[blk_ref[0, cid]], buf.at[0], sem.at[0]
                        ).wait()

                        def pbody(t):
                            @pl.when(jnp.any(emask[t] > 0))
                            def _tile():
                                _process_supertile(cid, buf, 0, t, use_emask=True)
                            return t + 1

                        jax.lax.while_loop(lambda t: t <= ts1, pbody, ts0)
            return 0

        jax.lax.fori_loop(0, nr, prologue_run, 0)

    # Per-supertile caps: the finest-grained front-to-back bound.  With the
    # prologue's hits in t_out, most supertiles' caps drop below their
    # remaining candidates' entries, so phase B's refine screen skips them
    # without touching the (8,128) slab units.
    for t in range(tiles):
        fl_t = flags_ref[t]
        tri_t = tri_out[t]
        live_t = ((fl_t & _FLAG_ACT) > 0) & (
            ((fl_t & _FLAG_ANYHIT) == 0) | (tri_t < 0)
        )
        caps[t] = jnp.max(jnp.where(live_t, t_out[t], t_min))

    cap_ref[0] = band_cap()

    # --- member-cluster DMA stream ------------------------------------------
    # PIPELINED mode overlaps the previous cluster's triangle math with the
    # next DMA (exactly one in flight); SINGLE mode does start+wait+process
    # per member with no outstanding DMA across the supertile while_loop —
    # Mosaic mis-schedules a data-dependent while_loop inside a DMA
    # start->wait window in some program contexts, so SINGLE is the safe
    # default until the pipelined form is proven in-situ.
    pend[0] = jnp.int32(-1)
    pend[1] = jnp.int32(0)
    pword[0] = jnp.uint32(0)

    def _enqueue(cid, word, g):
        """Legacy per-member double-buffered path (VPT_STREAM_PIPELINE=1)."""
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
            pw = pword[0]
            pend[0] = cid
            pend[1] = slot
            pword[0] = word
            _process_cluster(prev, buf, prev_slot, pw)

        @pl.when(prev < 0)
        def _first():
            pltpu.make_async_copy(
                tris_ref.at[blk_ref[0, cid]], buf.at[prev_slot], sem.at[prev_slot]
            ).start()
            pend[0] = cid
            pword[0] = word

    def cond(state):
        return state[1]

    def body(state):
        gi, _ = state
        g = order_ref[0, 0, gi]
        word = bits_ref[0, 0, g]
        c0 = g * GROUP_SIZE

        if not pipelined:
            # ONE fixed-size async copy fetches the whole group's member
            # blocks (real members are consecutive tris_rk rows from
            # gblk_ref; trailing zero-pad rows make the fixed size safe) —
            # one DMA latency per candidate group instead of up to
            # GROUP_SIZE start+wait stalls.  Member refinement still skips
            # the slab/MT work of members no surviving supertile enters.
            @pl.when(word != jnp.uint32(0))
            def _grp():
                cp = pltpu.make_async_copy(
                    tris_ref.at[pl.ds(gblk_ref[0, g], GROUP_SIZE)], gbuf, gsem
                )
                cp.start()
                cp.wait()
                for m in range(GROUP_SIZE):
                    cid = c0 + m

                    @pl.when(cnt_ref[0, cid] > 0)
                    def _m(cid=cid, m=m):
                        w2 = _refine_word(cid, word, g)

                        @pl.when(w2 != jnp.uint32(0))
                        def _hit():
                            _process_cluster(cid, gbuf, m, w2, use_emask=True)
        else:
            for m in range(GROUP_SIZE):
                cid = c0 + m

                @pl.when((cnt_ref[0, cid] > 0) & (word != jnp.uint32(0)))
                def _m(cid=cid):
                    _enqueue(cid, word, g)

        cap_ref[0] = band_cap()
        gi2 = gi + 1
        nxt = entry_ref[0, 0, jnp.minimum(gi2, jnp.maximum(ng - 1, 0))]
        return gi2, (gi2 < ng) & (nxt < cap_ref[0])

    jax.lax.while_loop(cond, body, (jnp.int32(0), ng > 0))

    if pipelined:
        last = pend[0]

        @pl.when(last >= 0)
        def _drain():
            slot = pend[1]
            pltpu.make_async_copy(
                tris_ref.at[blk_ref[0, last]], buf.at[slot], sem.at[slot]
            ).wait()
            _process_cluster(last, buf, slot, pword[0])


@functools.partial(
    jax.jit, static_argnames=("t_min", "interpret")
)
def stream_pallas(
    pnrun,          # (B, depth) i32 — prologue runs per level
    prun,           # (B, depth*Gp) i32 — level-major run group ids
    pt0, pt1,       # (B, depth*Gp) i32 — run supertile spans
    gk,             # (B, depth*T, 8, 128) i32 — per-ray level groups
    ngrp,           # (B,) i32
    order,          # (B, Gp) i32
    entry_sorted,   # (B, Gp) f32
    bits,           # (B, G) uint32
    sent,           # (B, T*Gp) f32 — per-(supertile, group) entry
    ox, oy, oz,     # (B, T, 8, 128) f32
    dx, dy, dz,
    tmax,           # (B, T, 8, 128) f32
    flags,          # (B, T, 8, 128) i32
    cluster_aabbs,  # (C, 6) f32
    cnt, base, block_id, inst,  # (C,) i32
    inv_rows,       # (n_inst, 12) f32
    group_blk0,     # (G,) i32 — first member block row per group
    tris_rk,        # (Bk, K/8 + 8, 128) f32 (GROUP_SIZE-1 trailing pad rows)
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
    depth = pnrun.shape[1]
    assert prun.shape[1] == depth * gp and gk.shape[1] == depth * t

    kernel = functools.partial(
        _stream_kernel, t_min, sub, instanced, _PIPELINED, depth, t
    )
    ray_spec = pl.BlockSpec(
        (None, t, SUPER_ROWS, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    gk_spec = pl.BlockSpec(
        (None, depth * t, SUPER_ROWS, 128), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
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
            smem_band(depth),        # pnrun
            smem_band(depth * gp),   # prun
            smem_band(depth * gp),   # pt0
            smem_band(depth * gp),   # pt1
            smem_band(1),      # ngrp
            smem_band(gp),     # order
            smem_band(gp),     # entry
            smem_band(g),      # bits
            smem_band(t * gp),  # sent
            ray_spec, ray_spec, ray_spec,   # o
            ray_spec, ray_spec, ray_spec,   # d
            ray_spec,          # tmax
            ray_spec,          # flags
            gk_spec,           # gk
            smem_glob(6 * c),  # cab
            smem_glob(c),      # cnt
            smem_glob(c),      # base
            smem_glob(c),      # blk
            smem_glob(c),      # inst
            smem_glob(12 * n_inst),  # inv
            smem_glob(g),      # gblk0
            pl.BlockSpec(memory_space=pltpu.HBM),  # tris (manual DMA)
        ],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[shape4, shape4i, shape4, shape4],
        scratch_shapes=[
            pltpu.VMEM((2, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((1,), jnp.uint32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.int32),
            pltpu.SMEM((t,), jnp.float32),
            pltpu.VMEM((GROUP_SIZE, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        pnrun.reshape(b, 1, depth),
        prun.reshape(b, 1, depth * gp),
        pt0.reshape(b, 1, depth * gp),
        pt1.reshape(b, 1, depth * gp),
        ngrp.reshape(b, 1, 1),
        order.reshape(b, 1, gp),
        entry_sorted.reshape(b, 1, gp),
        bits.reshape(b, 1, g),
        sent.reshape(b, 1, t * gp),
        ox, oy, oz, dx, dy, dz,
        tmax, flags, gk,
        cluster_aabbs.reshape(1, 6 * c),
        cnt.reshape(1, c), base.reshape(1, c), block_id.reshape(1, c),
        inst.reshape(1, c),
        inv_rows.reshape(1, 12 * n_inst),
        group_blk0.reshape(1, g),
        tris_rk,
    )
    return t_o, tri_o, u_o, v_o


def intersect_stream(
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
    cluster-major stream kernel.  Drop-in replacement for
    cluster.intersect_clusters(sort_rays=True) semantics.

    `anyhit` — (N,) bool: rays that may stop at their FIRST found hit
    (shadow queries).  Their returned hit is *a* hit below t_max, not
    necessarily the closest.  None = all closest-hit.
    """
    n_orig = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    if active is None:
        active = jnp.ones(n_orig, bool)
    if anyhit is None:
        anyhit = jnp.zeros(n_orig, bool)

    # Small wavefronts use fewer supertiles per band (the uint32 mask just
    # leaves its high bits clear) so tests/interpret mode don't pad a
    # 300-ray call to a full 32K band.
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
        anyhit = jnp.concatenate([anyhit, jnp.zeros(pad, bool)])
    n = origin.shape[0]

    # Root-exit bound (see intersect_clusters): no hit can lie beyond the
    # ray's exit from the scene root box, so escaping rays stop holding the
    # front-to-back cap up.
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
    ).T  # (3, Gp)
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T

    # ---- sort keys: first PROLOGUE entered groups per ray -----------------
    # The key is the base-(gp+1) packing of the ray's first `depth` entered
    # group ids in entry order, so the payload sort leaves each level's
    # groups row-contiguous and the kernel's dense prologue can recover
    # them with two integer divides.  Sentinel component = gp (no entry /
    # inactive), which sorts last and matches no run table entry.
    gp1 = g_padded + 1
    depth = PROLOGUE
    if depth == 3 and gp1 ** 3 >= 2 ** 31:
        depth = 2

    n_pk = n // PACKET_SIZE
    tn0, tf0 = _slab_tn_tf(
        origin.reshape(n_pk, PACKET_SIZE, 3),
        direction.reshape(n_pk, PACKET_SIZE, 3),
        tmax_arr.reshape(n_pk, PACKET_SIZE), gmin_pad, gmax_pad, t_min,
    )
    ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)
    sentinel = jnp.int32(g_padded)
    ids_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
    levels = []
    rem = ent
    for _ in range(max(depth, 2)):
        gl = jnp.argmin(rem, axis=1).astype(jnp.int32)
        vl = jnp.min(rem, axis=1)
        levels.append(jnp.where(jnp.isfinite(vl), gl, sentinel))
        rem = jnp.where(ids_row == gl[:, None], jnp.inf, rem)
    key = levels[0]
    for gl in levels[1:depth] if depth >= 2 else levels[1:2]:
        key = key * gp1 + gl
    key = jnp.where(active, key, jnp.int32(gp1 ** max(depth, 2) - 1))

    flags = active.astype(jnp.int32) + anyhit.astype(jnp.int32) * 2
    lane = jax.lax.iota(jnp.int32, n)
    (key_s, lane_key, ox, oy, oz, dxs, dys, dzs, tmax_s, flags_s) = jax.lax.sort(
        (key, lane, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         tmax_arr, flags),
        num_keys=1, is_stable=True,
    )

    # ---- prologue tables: unpack per-ray level groups from the sorted key,
    # build per-band (distinct group, supertile span) run lists ------------
    key_levels = max(depth, 2)
    comps = []
    kk = key_s
    for l in range(key_levels - 1, 0, -1):
        div = kk // gp1
        comps.append(kk - div * gp1)
        kk = div
    comps.append(kk)
    comps.reverse()          # comps[0] = first entered group, ...
    lvl_s = comps[:depth]

    b = n // band                        # bands
    si_band = (jnp.arange(band, dtype=jnp.int32) // (SUPER_ROWS * 128))[None, :]
    BIG_I = jnp.int32(1 << 30)
    gid_b = jnp.broadcast_to(
        jnp.arange(g_padded, dtype=jnp.int32)[None, :], (b, g_padded)
    )
    real_g = (jnp.arange(g_padded, dtype=jnp.int32) < g)[None, :]
    pnr, prs, pt0s, pt1s = [], [], [], []
    if not lvl_s:
        # depth 0: phase A disabled — one all-empty run level (nrun = 0)
        # keeps the kernel signature unchanged; its fori_loop never runs.
        pnrun = jnp.zeros((b, 1), jnp.int32)
        prun = jnp.zeros((b, g_padded), jnp.int32)
        pt0 = jnp.zeros((b, g_padded), jnp.int32)
        pt1 = jnp.zeros((b, g_padded), jnp.int32)
        gk = jnp.full((b, tiles_pb, SUPER_ROWS, 128), sentinel, jnp.int32)
    for lvl in lvl_s:
        vb = lvl.reshape(b, band)
        eq = vb[:, :, None] == ids_row[None]              # (B, band, Gp)
        cntg = jnp.sum(eq, axis=1)
        smin = jnp.min(jnp.where(eq, si_band[:, :, None], BIG_I), axis=1)
        smax = jnp.max(jnp.where(eq, si_band[:, :, None], -1), axis=1)
        present = (cntg > 0) & real_g
        runkey = jnp.where(present, gid_b, BIG_I)
        rg, t0v, t1v = jax.lax.sort(
            (runkey, smin.astype(jnp.int32), smax.astype(jnp.int32)),
            dimension=1, num_keys=1,
        )
        pnr.append(jnp.sum(present, axis=1).astype(jnp.int32))
        prs.append(rg)
        pt0s.append(t0v)
        pt1s.append(t1v)
    if lvl_s:
        pnrun = jnp.stack(pnr, axis=1)
        prun = jnp.concatenate(prs, axis=1)
        pt0 = jnp.concatenate(pt0s, axis=1)
        pt1 = jnp.concatenate(pt1s, axis=1)
        gk = jnp.concatenate(
            [lvl.reshape(b, tiles_pb, SUPER_ROWS, 128) for lvl in lvl_s], axis=1
        )

    # ---- post-sort cull: per-supertile group masks + band tables ----------
    # Prologue (ray, group) incidences are excluded so phase B never
    # re-visits a group on behalf of a ray that already tested it densely.
    n_st = n // (SUPER_ROWS * 128)       # supertiles
    o_s = jnp.stack([ox, oy, oz], axis=-1).reshape(n_st, SUPER_ROWS * 128, 3)
    d_s = jnp.stack([dxs, dys, dzs], axis=-1).reshape(n_st, SUPER_ROWS * 128, 3)
    act_s = (flags_s & 1) > 0
    tm_eff = jnp.where(act_s, tmax_s, jnp.float32(t_min)).reshape(
        n_st, SUPER_ROWS * 128
    )
    tns, tfs = _slab_tn_tf(o_s, d_s, tm_eff, gmin_pad, gmax_pad, t_min)
    enter_st = tns <= tfs
    if lvl_s:
        ex = jnp.zeros((n, g_padded), bool)
        for lvl in lvl_s:
            ex = ex | (ids_row == lvl[:, None])
        enter_st = enter_st & ~ex.reshape(n_st, SUPER_ROWS * 128, g_padded)
    st_any = jnp.any(enter_st, axis=1)                      # (S, Gp)
    st_entry = jnp.min(jnp.where(enter_st, tns, jnp.inf), axis=1)  # (S, Gp)

    shifts = jnp.arange(tiles_pb, dtype=jnp.uint32)
    bits = jnp.sum(
        st_any.reshape(b, tiles_pb, g_padded).astype(jnp.uint32)
        << shifts[None, :, None],
        axis=1,
        dtype=jnp.uint32,
    )  # (B, Gp)
    entry_bg = jnp.min(
        st_entry.reshape(b, tiles_pb, g_padded), axis=1
    )  # (B, Gp)
    sent = st_entry.reshape(b, tiles_pb * g_padded)  # (B, T*Gp) per-supertile
    gids = jnp.broadcast_to(
        jnp.arange(g_padded, dtype=jnp.int32)[None, :], (b, g_padded)
    )
    entry_sorted, order = jax.lax.sort((entry_bg, gids), dimension=1, num_keys=1)
    ngrp = jnp.sum(jnp.isfinite(entry_bg), axis=1).astype(jnp.int32)

    shape4 = (b, tiles_pb, SUPER_ROWS, 128)
    bt, btri, bu, bv = stream_pallas(
        pnrun, prun, pt0, pt1, gk,
        ngrp, order, entry_sorted, bits[:, :g], sent,
        ox.reshape(shape4), oy.reshape(shape4), oz.reshape(shape4),
        dxs.reshape(shape4), dys.reshape(shape4), dzs.reshape(shape4),
        tmax_s.reshape(shape4), flags_s.reshape(shape4),
        cl.aabbs, cl.count, cl.start, cl.block_id, cl.inst, cl.inv_rows,
        cl.group_blk0, cl.tris_rk,
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
