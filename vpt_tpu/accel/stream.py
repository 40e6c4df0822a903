"""Cluster-major streaming intersection — the TPU "RT core".

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
      ClusterData.group_blk0), then for each member cluster and each
      set supertile bit (screened against the per-supertile running
      best-t cap at one SMEM compare): a single-drain supertile visit.

  Work scales with (ray, cluster) INCIDENCES instead of packet unions, and
  each triangle block moves HBM->VMEM once per band instead of once per
  visiting packet (~20x fewer DMAs on colonnade).

Round-4 schedule changes vs r3 (measured on chip; an "all rows
unconditionally, one drain" variant was tried first and lost — wasted
vector work on non-entering rows beats saved drains at 13-20% fill):

  - refine & process are ONE pass: the r3 kernel slab-tested each
    (member, supertile) twice (once to refine the DMA word, once to
    process) with a drain each; here one cluster slab feeds an 8-bit row
    mask and each entering row's sub-slab feeds an 8-bit sub mask,
  - the per-supertile best-t cap screen (`sent` vs `caps`) runs BEFORE
    any vector work, at one SMEM compare per candidate bit,
  - the band early-exit cap is a scalar loop over the 32 SMEM caps —
    no full-band vector reduction per candidate group,
  - the dense prologue (phase A) and the pipelined per-member DMA are
    deleted: both measured slower than the plain schedule (see PERF.md).

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

from vpt_tpu.accel import envelope
from vpt_tpu.accel.cluster import ClusterData
from vpt_tpu.accel.traverse import Hit, T_MAX, T_MIN
from vpt_tpu.accel.visit_kernel import GROUP_SIZE, N_SUB

# Rows per supertile: (SUPER_ROWS, 128) rays share one visit's scalar
# orchestration — bigger supertiles amortize it over more rays at the cost
# of a wider candidate union (lower MT fill).  8 = one f32 vreg per row.
SUPER_ROWS = 8
TILES_PER_BAND = 32     # supertiles per band (= bits of the uint32 mask)
BAND = TILES_PER_BAND * SUPER_ROWS * 128  # 32768 rays

_FLAG_ACT = 1
_FLAG_ANYHIT = 2

# Profiling ablations (scripts/visit_floor_probe.py): compile-time switches
# that remove stages of the visit so on-chip time attributes to cluster
# slab / row sub-slab / MT.  "" = production.  NEVER set in rendering —
# envguard.guard_ablations() hard-fails golden runs if one leaks in.
#   norows — cluster slab + rbits drain only (skip sub-slabs + MT)
#   nomt   — cluster slab + row sub-slabs + drains (skip MT blocks)
from vpt_tpu.envguard import guard_ablations

guard_ablations()
_ABLATE = os.environ.get("VPT_STREAM_ABLATE", "")

# MT dispatch mode: "dense" (default) runs every sub-block's
# Moller-Trumbore masked by the vector enter mask; "sparse" reads an
# 8-bit sub mask back to the scalar core per entering row and gates each
# MT block on its bit.  The readback is a vector->scalar pipeline drain
# (~1 us): measured on colonnade 512x4spp, dense 3.71 s/dispatch vs
# sparse 4.28 s (-13%) even though dense does ~3x the MT vector work.
_MT_DENSE = os.environ.get("VPT_STREAM_MT", "dense") != "sparse"

# Schedule knobs (results identical; drain/vector-work trade, fenced by
# envguard so probe settings can't leak into golden/bench runs):
#   VPT_CAPS_EVERY=N — tighten per-supertile caps every Nth candidate
#     group instead of every (group, supertile) visit (each tighten is a
#     vector->scalar drain).
#   VPT_ROW_GATE=all — skip the (member,row)-bits words readback (two
#     drains per visit) and run every member/row with vector enter masks.
_CAPS_EVERY = int(os.environ.get("VPT_CAPS_EVERY", "1"))
_ROW_GATE_ALL = os.environ.get("VPT_ROW_GATE", "gated") == "all"


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
    tiles: int,        # supertiles per band
    # per-band SMEM tables (3D (1,1,W) blocks: TPU lowering requires the
    # last two block dims to equal the array dims for SMEM)
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
    invx, invy, invz,  # (T, 8, 128) VMEM scratch: per-band reciprocal dirs
    caps,              # (T,) f32 SMEM: per-supertile running best-t caps
    gbuf,              # (2, GROUP_SIZE, K/8 + 8, 128) VMEM: double-buffered group blocks
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

    def _tile_cap(j):
        """Max best-t over supertile j's live rays.  Any-hit rays that
        found a hit stop holding the cap up."""
        fl = flags_ref[j]
        live = ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri_out[j] < 0)
        )
        return jnp.max(jnp.where(live, t_out[j], t_min))

    def _member_enter(cid, j):
        """World-space member-cluster slab for supertile j: (8, 128) enter
        mask, tf bounded by each live ray's best."""
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])      # (8, 128) each
        fl = flags_ref[j]
        live = ((fl & _FLAG_ACT) > 0) & (
            ((fl & _FLAG_ANYHIT) == 0) | (tri_out[j] < 0)
        )
        inv8 = (invx[j], invy[j], invz[j])
        tn = jnp.full((SUPER_ROWS, 128), t_min, jnp.float32)
        tf = jnp.where(live, t_out[j], t_min)
        o6 = 6 * cid
        for ax in range(3):
            s0 = (cab_ref[0, o6 + ax] - o8[ax]) * inv8[ax]
            s1 = (cab_ref[0, o6 + 3 + ax] - o8[ax]) * inv8[ax]
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
        return (tn <= tf) & live

    def _visit_group_supertile(c0, src, j, g_for_caps):
        """All GROUP_SIZE member clusters of one candidate group against
        supertile j.  Pass 1 (vector only) runs every member's world slab
        and packs (member, row) any-bits as distinct powers of two — ONE
        vector->scalar drain per 4 members reads them back, replacing the
        old per-member rbits drain (plus per-member caps drain) that
        dominated kernel time at ~1 us per drain.  Pass 2 re-runs the
        12-op slab only for members with bits set and row-dispatches the
        sub-slab + MT exactly as before."""
        if _ROW_GATE_ALL:
            # Drain-free schedule: no (member,row) bits readback — every
            # occupied member runs all rows with vector enter masks.
            if _ABLATE != "norows":
                for m in range(GROUP_SIZE):

                    @pl.when(cnt_ref[0, c0 + m] > 0)
                    def _m(m=m):
                        cid = c0 + m
                        enter = _member_enter(cid, j)
                        _visit_rows(cid, src, m, j, None, enter)
        else:
            riota = jax.lax.broadcasted_iota(jnp.int32, (SUPER_ROWS, 1), 0)
            words = []
            for w0 in range(0, GROUP_SIZE, 4):
                acc = jnp.zeros((SUPER_ROWS, 1), jnp.int32)
                for mw in range(min(4, GROUP_SIZE - w0)):
                    cid = c0 + w0 + mw
                    enter = _member_enter(cid, j)
                    row_any = jnp.max(
                        enter.astype(jnp.int32), axis=1, keepdims=True
                    )  # (8, 1)
                    occupied = jnp.where(
                        cnt_ref[0, cid] > 0, jnp.int32(1), jnp.int32(0)
                    )
                    acc = acc + jnp.where(
                        row_any > 0,
                        jnp.int32(1) << (riota + 8 * mw),
                        jnp.int32(0),
                    ) * occupied
                # Distinct powers of two per (member, row): sum == bitwise or.
                words.append(jnp.sum(acc))

            if _ABLATE != "norows":
                for m in range(GROUP_SIZE):
                    byte = (words[m // 4] >> (8 * (m % 4))) & 0xFF

                    @pl.when(byte != 0)
                    def _m(m=m, byte=byte):
                        cid = c0 + m
                        enter = _member_enter(cid, j)
                        _visit_rows(cid, src, m, j, byte, enter)

        # Tighten the supertile's running cap (a vector->scalar drain) —
        # every visit by default, throttled by VPT_CAPS_EVERY.
        if _CAPS_EVERY <= 1:
            caps[j] = _tile_cap(j)
        else:
            @pl.when(jax.lax.rem(g_for_caps, jnp.int32(_CAPS_EVERY)) == 0)
            def _tighten():
                caps[j] = _tile_cap(j)

    def _visit_rows(cid, src, sidx, j, rbits, enter):
        o8 = (ox_ref[j], oy_ref[j], oz_ref[j])
        d8 = (dx_ref[j], dy_ref[j], dz_ref[j])
        inv8 = (invx[j], invy[j], invz[j])
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
            linv_x, linv_y, linv_z = inv8

        # Row dispatch: the 8-bit row mask gates each row's (8 subs, 128)
        # sub-AABB slab.  (An all-rows-unconditional variant was measured
        # SLOWER on chip — at ~13-20% lane fill most rows enter nothing,
        # and the wasted vector work beats the saved drains.)  Boxes sit in
        # sublanes vs ray rows in lanes so every broadcast is
        # single-dimension.
        box_lo = [meta[:, ax : ax + 1] for ax in range(3)]     # (8, 1) each
        box_hi = [meta[:, 3 + ax : 4 + ax] for ax in range(3)]
        siota = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, 1), 0)
        for r in range(SUPER_ROWS):

            def _row(r=r):
                er = enter[r : r + 1, :]                       # (1, 128)
                ro_r = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                ri_r = (linv_x[r : r + 1], linv_y[r : r + 1],
                        linv_z[r : r + 1])
                stn = jnp.full((N_SUB, 128), t_min, jnp.float32)
                stf = jnp.where(er, t_out[j, r : r + 1, :], t_min)
                for ax in range(3):
                    lo_t = (box_lo[ax] - ro_r[ax]) * ri_r[ax]  # (8, 128)
                    hi_t = (box_hi[ax] - ro_r[ax]) * ri_r[ax]
                    stn = jnp.maximum(stn, jnp.minimum(lo_t, hi_t))
                    stf = jnp.minimum(stf, jnp.maximum(lo_t, hi_t))
                s_ent_r = (stn <= stf) & er                    # (8 subs, 128)
                s_tn_r = stn
                if _MT_DENSE:
                    # Dense mode: run every sub-block's MT masked by
                    # sub_enter — skips the sbits vector->scalar readback
                    # (a pipeline drain per entering row).
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
                for s in range(N_SUB if _ABLATE != "nomt" else 0):

                    def _mt(s=s, r=r, s_ent_r=s_ent_r, s_tn_r=s_tn_r):
                        c0 = s * 16
                        ro = (lox[r : r + 1], loy[r : r + 1], loz[r : r + 1])
                        rd = (ldx[r : r + 1], ldy[r : r + 1], ldz[r : r + 1])
                        # Bound by the CURRENT row best (re-read per
                        # sub-block so earlier hits tighten later tests).
                        bt = t_out[j, r : r + 1, :]
                        sub_enter = s_ent_r[s : s + 1, :] & (bt >= s_tn_r[s : s + 1, :])

                        def col(kk):
                            return blk[0:sub, c0 + kk : c0 + kk + 1]  # (sub, 1)

                        # Moller-Trumbore (sub, 128): triangles in sublanes,
                        # rays in lanes — masked to the entering rows only.
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

                    if _MT_DENSE:
                        _mt()
                    else:
                        pl.when(((sbits >> s) & 1) != 0)(_mt)

            if rbits is None:
                _row()
            else:
                pl.when(((rbits >> r) & 1) != 0)(_row)

    def _visit_group(c0, src, word, g):
        """Visit every supertile whose mask bit is set, screened against
        the per-supertile running cap at one SMEM compare per bit."""
        gp_w = order_ref.shape[2]

        def body(w):
            j = _ctz32(w)

            @pl.when(sent_ref[0, 0, j * gp_w + g] <= caps[j])
            def _go():
                _visit_group_supertile(c0, src, j, g)

            return w & (w - jnp.uint32(1))

        jax.lax.while_loop(lambda w: w != jnp.uint32(0), body, word)

    # Per-supertile caps: the finest-grained front-to-back bound.
    for t in range(tiles):
        caps[t] = _tile_cap(t)

    # --- candidate group stream ------------------------------------------
    # Double-buffered group DMA: group gi+1's member blocks (consecutive
    # tris_rk rows from gblk_ref, trailing zero-pad rows make the fixed
    # size safe) prefetch into slot (gi+1)%2 while gi's visit computes —
    # in-dispatch the ray-payload copies XLA schedules around the kernel
    # contend for DMA, so a synchronous start+wait per candidate group
    # stalls far longer than it does standalone.
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

    def cond(state):
        return state[1]

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

        # Band early-exit bound: max cap over the band's supertiles — a
        # scalar loop over SMEM, no vector reduction.
        cap = caps[0]
        for t in range(1, tiles):
            cap = jnp.maximum(cap, caps[t])
        nxt = entry_ref[0, 0, jnp.minimum(gi2, jnp.maximum(ng - 1, 0))]
        return gi2, (gi2 < ng) & (nxt < cap)

    gi_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), ng > 0))

    # Early cap-exit leaves at most one prefetch in flight — consume it so
    # the semaphore is balanced for the next grid step.
    @pl.when((ng > 0) & (gi_final < ng))
    def _drain():
        _wait_fetch(gi_final)


@functools.partial(
    jax.jit, static_argnames=("t_min", "interpret")
)
def stream_pallas(
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

    kernel = functools.partial(_stream_kernel, t_min, sub, instanced, t)
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
            smem_band(1),      # ngrp
            smem_band(gp),     # order
            smem_band(gp),     # entry
            smem_band(g),      # bits
            smem_band(t * gp),  # sent
            ray_spec, ray_spec, ray_spec,   # o
            ray_spec, ray_spec, ray_spec,   # d
            ray_spec,          # tmax
            ray_spec,          # flags
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
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
            pltpu.VMEM((t, SUPER_ROWS, 128), jnp.float32),
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
        tmax, flags,
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

    # ---- sort keys: first two entered groups per ray -----------------------
    # The key is the base-(gp+1) packing of the ray's first two entered
    # group ids in entry order: rays needing the same clusters first become
    # row-adjacent.  Sentinel component = gp (no entry / inactive), which
    # sorts last.  Computed by the Pallas envelope kernel — the XLA
    # (N, G) slab + double argmin chain it replaces ran at ~1.5% VPU
    # utilization (see accel/envelope.py).
    gp1 = g_padded + 1
    key = envelope.ray_keys(
        origin, inv_all, tmax_arr, gmin_pad, gmax_pad,
        t_min=float(t_min), levels=2, interpret=interpret,
    )
    key = jnp.where(active, key, jnp.int32(gp1 * gp1 - 1))

    flags = active.astype(jnp.int32) + anyhit.astype(jnp.int32) * 2
    lane = jax.lax.iota(jnp.int32, n)
    (key_s, lane_key, ox, oy, oz, dxs, dys, dzs, tmax_s, flags_s) = jax.lax.sort(
        (key, lane, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         tmax_arr, flags),
        num_keys=1, is_stable=True,
    )

    # ---- post-sort cull: per-supertile group masks + band tables ----------
    b = n // band                        # bands
    o_s = jnp.stack([ox, oy, oz], axis=-1)
    d_s = jnp.stack([dxs, dys, dzs], axis=-1)
    inv_s = 1.0 / jnp.where(jnp.abs(d_s) > 1e-20, d_s, 1e-20)
    act_s = (flags_s & 1) > 0
    tm_eff = jnp.where(act_s, tmax_s, jnp.float32(t_min))
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
