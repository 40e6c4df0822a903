"""Probe Mosaic primitives the dense2 kernel design depends on.

1. Dynamic-lane SCALAR read from a VMEM ref (ox_ref[r, lane] with traced
   lane) — needed to extract an arbitrary ray's components for ray-major
   (transposed) Moller-Trumbore.
2. A scalar SMEM binning loop (iterate rays, append lane ids to per-group
   SMEM bins) — needed to bin tail incidences per band without an XLA sort.
3. Ray-major MT block shape (rays in sublanes, tris in lanes) compiles.

Prints PASS/FAIL per probe plus rough timings on the real chip.

Usage: python scripts/mosaic_probe.py [interpret]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe1(interpret):
    """Dynamic scalar read from VMEM: out[0, i] = x[i % 8, perm[i]]."""

    def kernel(perm_ref, x_ref, out_ref):
        def body(i, _):
            lane = perm_ref[0, i]
            out_ref[0, i] = x_ref[i % 8, lane]
            return 0

        jax.lax.fori_loop(0, 128, body, 0)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    perm = jnp.asarray((np.arange(128) * 37) % 128, jnp.int32).reshape(1, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(perm, x)
    expect = np.asarray(x)[np.arange(128) % 8, np.asarray(perm)[0]]
    ok = np.allclose(np.asarray(out)[0], expect)
    print(f"probe1 dynamic-lane scalar VMEM read: {'PASS' if ok else 'FAIL'}",
          flush=True)
    return ok


def probe2(interpret):
    """Scalar binning: per-ray group ids in SMEM -> per-group bins in SMEM,
    then emit bins as output.  Also times 1024-iteration scalar loops."""
    n, g, cap = 1024, 16, 256

    def kernel(gid_ref, bins_ref, cnt_ref):
        for j in range(g):
            cnt_ref[0, j] = 0

        def body(i, _):
            gg = gid_ref[0, i]
            c = cnt_ref[0, gg]
            bins_ref[gg, c] = i
            cnt_ref[0, gg] = c + 1
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    gid = jnp.asarray((np.arange(n) * 7) % g, jnp.int32).reshape(1, n)
    bins, cnt = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, cap), jnp.int32),
            jax.ShapeDtypeStruct((1, g), jnp.int32),
        ],
        interpret=interpret,
    )(gid)
    cnt = np.asarray(cnt)[0]
    ok = (cnt == n // g).all()
    bins = np.asarray(bins)
    for j in range(g):
        got = np.sort(bins[j, : cnt[j]])
        want = np.where((np.arange(n) * 7) % g == j)[0]
        ok = ok and np.array_equal(got, want)
    print(f"probe2 scalar SMEM binning: {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def probe3(interpret):
    """Ray-major MT shape: rays in sublanes (8), triangle components read
    as (1, 128) lane rows, broadcast ray scalars -> per (ray, tri) hit t."""

    def kernel(rays_ref, tris_ref, out_ref):
        # rays: (8, 8) [ox oy oz dx dy dz tmax pad] per sublane-ray
        # tris: (9, 128) p0/e1/e2 components in lanes
        o = [rays_ref[:, k : k + 1] for k in range(3)]  # (8,1)
        d = [rays_ref[:, 3 + k : 4 + k] for k in range(3)]
        p0 = [tris_ref[k : k + 1, :] for k in range(3)]  # (1,128)
        e1 = [tris_ref[3 + k : 4 + k, :] for k in range(3)]
        e2 = [tris_ref[6 + k : 7 + k, :] for k in range(3)]
        pv = [d[(k + 1) % 3] * e2[(k + 2) % 3] - d[(k + 2) % 3] * e2[(k + 1) % 3]
              for k in range(3)]
        det = sum(e1[k] * pv[k] for k in range(3))
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tv = [o[k] - p0[k] for k in range(3)]
        uu = sum(tv[k] * pv[k] for k in range(3)) * inv_det
        qv = [tv[(k + 1) % 3] * e1[(k + 2) % 3] - tv[(k + 2) % 3] * e1[(k + 1) % 3]
              for k in range(3)]
        vv = sum(d[k] * qv[k] for k in range(3)) * inv_det
        tt = sum(e2[k] * qv[k] for k in range(3)) * inv_det
        valid = (jnp.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4)
        out_ref[...] = jnp.where(valid, tt, jnp.inf)

    rng = np.random.default_rng(0)
    rays = np.zeros((8, 8), np.float32)
    rays[:, 0:3] = rng.normal(size=(8, 3)) * 0.1
    rays[:, 3:6] = rng.normal(size=(8, 3))
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    p0 = rng.normal(size=(128, 3)).astype(np.float32) * 2
    e1 = rng.normal(size=(128, 3)).astype(np.float32)
    e2 = rng.normal(size=(128, 3)).astype(np.float32)
    tris = np.concatenate([p0.T, e1.T, e2.T], axis=0).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(rays), jnp.asarray(tris))

    # NumPy oracle
    o = rays[:, None, 0:3]
    d = rays[:, None, 3:6]
    pv = np.cross(d, e2[None])
    det = np.sum(e1[None] * pv, axis=2)
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = o - p0[None]
    uu = np.sum(tv * pv, axis=2) * inv_det
    qv = np.cross(tv, e1[None])
    vv = np.sum(d * qv, axis=2) * inv_det
    tt = np.sum(e2[None] * qv, axis=2) * inv_det
    valid = (np.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4)
    expect = np.where(valid, tt, np.inf)
    ok = np.allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5, equal_nan=True)
    print(f"probe3 ray-major MT: {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def probe4_timing():
    """Time scalar loops + dynamic reads at kernel scale on the chip."""
    n_iter = 8192

    def kernel(perm_ref, x_ref, out_ref):
        def body(i, acc):
            lane = perm_ref[0, i % 1024]
            return acc + x_ref[(i % 64) // 8, lane]

        out_ref[0, 0] = jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    x = jnp.ones((8, 128), jnp.float32)
    perm = jnp.asarray((np.arange(1024) * 37) % 128, jnp.int32).reshape(1, 1024)
    f = jax.jit(
        lambda p, xx: pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(p, xx)
    )
    out = f(perm, x)
    jax.block_until_ready(out)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(perm, x + jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"probe4 {n_iter} dynamic scalar VMEM reads: {med*1e3:.2f} ms "
          f"({med/n_iter*1e9:.0f} ns/read incl. relay floor)", flush=True)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    probe1(interpret)
    probe2(interpret)
    probe3(interpret)
    if not interpret:
        probe4_timing()


if __name__ == "__main__":
    main()
