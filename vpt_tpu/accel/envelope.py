"""Pallas envelope kernels for the stream/occlude trace paths.

The XLA fusions that prepare a trace — the (N, G) ray-vs-group slab pass
reduced to per-ray sort keys, and the post-sort (N, G) pass reduced to
per-supertile candidate tables — run at ~1.5% VPU utilization (measured:
30-60 ms each per 512x512 dispatch iteration set, ~370 ms/dispatch total)
because XLA materializes (N, G) intermediates in HBM and lowers the
argmin/any reductions as separate passes.  These kernels keep the whole
(ray, group) tile in vector registers: boxes ride the sublane dimension
(8 groups per op), rays ride lanes (128 per op), every broadcast is
single-dimension (Mosaic has no 2D broadcast), and nothing (N, G)-sized
ever touches HBM.

Two kernels:

  ray_keys        — per-ray packed sort key from the first `levels`
                    entered groups in entry order (levels=2 for the main
                    trace, 1 for occlusion).  Replaces the XLA slab +
                    argmin + re-masked argmin chain.
  supertile_tables — per-(supertile, group) minimum entry distance
                    (+inf = no ray of the supertile enters the group),
                    written group-major (Gp, S).  isfinite() of it is the
                    supertile visit mask; replaces the post-sort XLA slab
                    + select/reduce chain in stream.py / occlude.py.

Both replicate cluster._slab_tn_tf's exact formula (tn clamped to t_min,
tf to the per-ray tmax, 1e-20 direction guard applied by the caller when
precomputing reciprocal directions), so culling decisions match the
in-kernel per-cluster slab tests the way the XLA envelope's did.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = float(3e9)
_INF = float("inf")


def _slab_rows(o_row, inv_row, tmax_row, boxes, gc, t_min):
    """Slab intervals of one 128-ray row vs 8 group boxes.

    o_row/inv_row: 3-tuples of (128,) vectors; tmax_row (128,).
    boxes: 6-tuple of (Gp, 1) refs (xlo, ylo, zlo, xhi, yhi, zhi).
    Returns ent (8, 128): entry t where tn <= tf, else +inf.
    """
    tn = jnp.full((8, 128), jnp.float32(t_min), jnp.float32)
    tf = jnp.broadcast_to(tmax_row.reshape(1, 128), (8, 128))
    for ax in range(3):
        lo = jnp.broadcast_to(boxes[ax][gc * 8:(gc + 1) * 8], (8, 128))
        hi = jnp.broadcast_to(boxes[3 + ax][gc * 8:(gc + 1) * 8], (8, 128))
        oc = jnp.broadcast_to(o_row[ax].reshape(1, 128), (8, 128))
        ic = jnp.broadcast_to(inv_row[ax].reshape(1, 128), (8, 128))
        s0 = (lo - oc) * ic
        s1 = (hi - oc) * ic
        tn = jnp.maximum(tn, jnp.minimum(s0, s1))
        tf = jnp.minimum(tf, jnp.maximum(s0, s1))
    return jnp.where(tn <= tf, tn, _INF)


def _minsel(a, aid, b, bid):
    """Pairwise (value, id) minimum, lexicographic: value ties resolve to
    the LOWER group id, matching XLA argmin's first-match rule regardless
    of merge order."""
    take = (a < b) | ((a == b) & (aid <= bid))
    return jnp.minimum(a, b), jnp.where(take, aid, bid)


def _keys_kernel(
    t_min: float, n_chunks: int, levels: int, gp: int,
    ox, oy, oz, ix, iy, iz, tm,      # (8, 128) ray blocks
    bxl, byl, bzl, bxh, byh, bzh,    # (Gp, 1) boxes
    key_out,                          # (8, 128) i32
):
    boxes = (bxl, byl, bzl, bxh, byh, bzh)
    gp1 = jnp.float32(gp + 1)
    sent = jnp.float32(gp)
    rows = []
    for r in range(8):
        o_row = (ox[r], oy[r], oz[r])
        i_row = (ix[r], iy[r], iz[r])
        t_row = tm[r]
        v1 = jnp.full((1, 128), _INF)
        a1 = jnp.full((1, 128), sent)
        v2 = jnp.full((1, 128), _INF)
        a2 = jnp.full((1, 128), sent)
        for gc in range(n_chunks):
            ent = _slab_rows(o_row, i_row, t_row, boxes, gc, t_min)
            # Mosaic's tpu.iota is integer-only; cast after (ids < 512 are
            # f32-exact, and f32 ids keep every select value-typed).
            gid = jnp.float32(gc * 8) + jax.lax.broadcasted_iota(
                jnp.int32, (8, 128), 0
            ).astype(jnp.float32)
            m1 = jnp.min(ent, axis=0, keepdims=True)
            c1 = jnp.min(jnp.where(ent == m1, gid, _BIG), axis=0, keepdims=True)
            if levels == 2:
                ent2 = jnp.where(gid == c1, _INF, ent)
                m2 = jnp.min(ent2, axis=0, keepdims=True)
                c2 = jnp.min(
                    jnp.where(ent2 == m2, gid, _BIG), axis=0, keepdims=True
                )
                # Merge the chunk's (m1,c1,m2,c2) into the running two-level
                # minimum; all selections are (value, id)-lexicographic so
                # entry-t ties resolve to the lower group id exactly like
                # XLA argmin's first-match rule.
                take = (v1 < m1) | ((v1 == m1) & (a1 <= c1))
                lose_v = jnp.where(take, m1, v1)
                lose_a = jnp.where(take, c1, a1)
                v1, a1 = _minsel(v1, a1, m1, c1)
                x, xa = _minsel(v2, a2, m2, c2)
                v2, a2 = _minsel(x, xa, lose_v, lose_a)
            else:
                v1, a1 = _minsel(v1, a1, m1, c1)
        l0 = jnp.where(v1 < _INF, a1, sent)
        if levels == 2:
            l1 = jnp.where(v2 < _INF, a2, sent)
            key_f = l0 * gp1 + l1
        else:
            key_f = l0
        rows.append(key_f.astype(jnp.int32))
    key_out[...] = jnp.concatenate(rows, axis=0)


@functools.partial(
    jax.jit, static_argnames=("t_min", "levels", "interpret")
)
def ray_keys(
    origin, direction_inv, tmax, gmin_pad, gmax_pad,
    t_min: float, levels: int = 2, interpret: bool = False,
):
    """Per-ray packed sort key from the first `levels` entered groups.

    origin (N, 3), direction_inv (N, 3) — reciprocal directions with the
    caller's 1e-20 guard already applied, tmax (N,) — the effective
    (active-masked, root-bounded) per-ray far limit.  gmin_pad/gmax_pad
    (3, Gp).  Returns (N,) int32: levels=2 -> g0*(Gp+1)+g1 with sentinel
    Gp for absent entries (identical packing to the XLA chain it
    replaces); levels=1 -> g0 or Gp.
    """
    n = origin.shape[0]
    gp = gmin_pad.shape[1]
    n_chunks = gp // 8
    r = n // 128

    def col(a, i):
        return a[:, i].reshape(r, 128)

    boxes = [gmin_pad[i].reshape(gp, 1) for i in range(3)] + [
        gmax_pad[i].reshape(gp, 1) for i in range(3)
    ]
    kernel = functools.partial(_keys_kernel, float(t_min), n_chunks, levels, gp)
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((gp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    key = pl.pallas_call(
        kernel,
        grid=(n // 1024,),
        in_specs=[ray_spec] * 7 + [box_spec] * 6,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.int32),
        interpret=interpret,
    )(
        col(origin, 0), col(origin, 1), col(origin, 2),
        col(direction_inv, 0), col(direction_inv, 1), col(direction_inv, 2),
        tmax.reshape(r, 128),
        *boxes,
    )
    return key.reshape(n)


def _tables_kernel(
    t_min: float, n_chunks: int, cols: int,
    ox, oy, oz, ix, iy, iz, tm,      # (8, 128) — one supertile's rays
    bxl, byl, bzl, bxh, byh, bzh,    # (Gp, 1)
    ent_out,                          # (Gp, cols) f32 — min entry, +inf none
):
    """One grid step = one supertile.  The output block holds `cols`
    supertile columns and is revisited by `cols` consecutive steps (index
    map i -> i // cols): each step masked-merges its (8,1) per-chunk
    accumulators into its own lane — Mosaic has no dynamic single-lane
    stores, and a (Gp, 1) output block is an illegal TPU block shape."""
    boxes = (bxl, byl, bzl, bxh, byh, bzh)
    col = pl.program_id(0) % cols

    @pl.when(col == 0)
    def _init():
        ent_out[...] = jnp.full(ent_out.shape, _INF, jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 1)
    for gc in range(n_chunks):
        acc = jnp.full((8, 1), _INF)
        for r in range(8):
            ent = _slab_rows(
                (ox[r], oy[r], oz[r]), (ix[r], iy[r], iz[r]), tm[r],
                boxes, gc, t_min,
            )
            acc = jnp.minimum(acc, jnp.min(ent, axis=1, keepdims=True))
        sl = slice(gc * 8, (gc + 1) * 8)
        ent_out[sl, :] = jnp.where(
            lane == col, jnp.broadcast_to(acc, (8, cols)), ent_out[sl, :]
        )


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def supertile_tables(
    origin, direction_inv, tmax_eff, gmin_pad, gmax_pad,
    t_min: float, interpret: bool = False,
):
    """Per-(supertile, group) minimum entry distance over the supertile's
    1024 rays; +inf where no ray enters.  Returns (S, Gp) f32 — callers
    take isfinite() as the visit mask (replaces stream.py's post-sort
    (N, G) slab + any/min reductions).  Rays must arrive already sorted;
    tmax_eff must already fold the active mask (inactive -> t_min).
    """
    n = origin.shape[0]
    gp = gmin_pad.shape[1]
    n_chunks = gp // 8
    r = n // 128
    s = n // 1024

    def col(a, i):
        return a[:, i].reshape(r, 128)

    boxes = [gmin_pad[i].reshape(gp, 1) for i in range(3)] + [
        gmax_pad[i].reshape(gp, 1) for i in range(3)
    ]
    cols = min(128, s)
    s_pad = -(-s // cols) * cols
    kernel = functools.partial(_tables_kernel, float(t_min), n_chunks, cols)
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((gp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ent_t = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[ray_spec] * 7 + [box_spec] * 6,
        out_specs=pl.BlockSpec(
            (gp, cols), lambda i: (0, i // cols), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gp, s_pad), jnp.float32),
        interpret=interpret,
    )(
        col(origin, 0), col(origin, 1), col(origin, 2),
        col(direction_inv, 0), col(direction_inv, 1), col(direction_inv, 2),
        tmax_eff.reshape(r, 128),
        *boxes,
    )
    return ent_t[:, :s].T
