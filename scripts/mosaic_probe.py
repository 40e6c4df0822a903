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


def probe5(interpret):
    """Dynamic-lane scalar STORE to VMEM: out[i % 8, perm[i]] = f(i) —
    needed to assemble gathered ray rows for dense ray-major MT."""

    def kernel(perm_ref, out_ref):
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

        def body(i, _):
            lane = perm_ref[0, i]
            out_ref[i % 8, lane] = jnp.float32(1.0) * (i + 1)
            return 0

        jax.lax.fori_loop(0, 128, body, 0)

    perm_np = (np.arange(128) * 37) % 128
    perm = jnp.asarray(perm_np, jnp.int32).reshape(1, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(perm)
    expect = np.zeros((8, 128), np.float32)
    for i in range(128):
        expect[i % 8, perm_np[i]] = i + 1
    ok = np.allclose(np.asarray(out), expect)
    print(f"probe5 dynamic-lane scalar VMEM store: {'PASS' if ok else 'FAIL'}",
          flush=True)
    return ok


def probe6_timing():
    """Time dynamic scalar VMEM stores at kernel scale."""
    n_iter = 8192

    def kernel(perm_ref, out_ref):
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

        def body(i, _):
            lane = perm_ref[0, i % 1024]
            out_ref[(i % 64) // 8, lane] = jnp.float32(i)
            return 0

        jax.lax.fori_loop(0, n_iter, body, 0)

    perm = jnp.asarray((np.arange(1024) * 37) % 128, jnp.int32).reshape(1, 1024)
    f = jax.jit(
        lambda p: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(p)
    )
    jax.block_until_ready(f(perm))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(perm + i * 0))
        ts.append(time.perf_counter() - t0)
    # inputs identical -> relay may cache; vary to be safe
    ts = []
    for i in range(5):
        p2 = jnp.asarray(((np.arange(1024) * 37 + i) % 128), jnp.int32).reshape(1, 1024)
        t0 = time.perf_counter()
        jax.block_until_ready(f(p2))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"probe6 {n_iter} dynamic scalar VMEM stores: {med*1e3:.2f} ms "
          f"({med/n_iter*1e9:.0f} ns/store incl. relay floor)", flush=True)


def probe7_sort_gather():
    """XLA building blocks at trace-relevant shapes: single-i32 sorts,
    multi-payload sorts, and row gathers with random vs local permutations."""
    import jax.random as jrand

    def timeit(f, *args, n=4):
        jax.block_until_ready(f(jnp.uint32(0), *args))
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.uint32(i + 1), *args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    key = jrand.PRNGKey(0)
    for m in (262144, 524288, 1048576, 2097152):
        vals = jrand.randint(key, (m,), 0, 1 << 28, dtype=jnp.int32)

        @jax.jit
        def sort1(seed, v):
            return jax.lax.sort((v ^ seed.astype(jnp.int32),), num_keys=1)[0]

        print(f"probe7 sort single-i32 {m}: {timeit(sort1, vals)*1e3:.2f} ms",
              flush=True)

    n = 262144
    fvals = jrand.uniform(key, (12, n))

    for n_ops in (2, 10, 14):
        @jax.jit
        def sortk(seed, v, k=n_ops):
            kk = (v[0] * 1e6).astype(jnp.int32) + seed.astype(jnp.int32)
            cols = (kk,) + tuple(v[j] for j in range(1, k))
            return jax.lax.sort(cols, num_keys=1, is_stable=True)[1]

        print(f"probe7 sort {n}x{n_ops}ops: {timeit(sortk, fvals)*1e3:.2f} ms",
              flush=True)

    # gathers: (N, 8) f32 table, random vs block-local perm, N and 2N rows
    tbl = jrand.uniform(key, (n, 8), jnp.float32)
    perm_rand = jrand.permutation(key, n)
    loc = (jnp.arange(n) // 1024) * 1024
    perm_loc = jnp.clip(loc + ((jnp.arange(n) * 37) % 1024), 0, n - 1)

    for nm, perm in (("random", perm_rand), ("local1k", perm_loc)):
        for rows in (n, 2 * n):
            idx = jnp.tile(perm, rows // n)

            @jax.jit
            def gath(seed, t, ix):
                return jnp.take(t + seed.astype(jnp.float32), ix, axis=0)

            print(f"probe7 gather (262144,8) {nm} x{rows}: "
                  f"{timeit(gath, tbl, idx)*1e3:.2f} ms", flush=True)


def probe8_smem_capacity(interpret):
    """How big can SMEM scratch get?  Tries growing allocations."""
    for kb in (64, 128, 256, 512):
        n = kb * 256  # i32 count

        def kernel(x_ref, out_ref, scratch):
            scratch[0, 0] = x_ref[0, 0]
            scratch[0, n - 1] = x_ref[0, 0] + 1
            out_ref[0, 0] = scratch[0, 0] + scratch[0, n - 1]

        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                scratch_shapes=[pltpu.SMEM((1, n), jnp.int32)],
                interpret=interpret,
            )(jnp.ones((1, 1), jnp.int32))
            ok = int(np.asarray(out)[0, 0]) == 3
            print(f"probe8 SMEM scratch {kb} KB: {'PASS' if ok else 'BAD VALUE'}",
                  flush=True)
        except Exception as e:
            print(f"probe8 SMEM scratch {kb} KB: FAIL ({str(e)[:80]})", flush=True)
            break


def probe9_vmem_to_smem_dma(interpret):
    """DMA a VMEM block into SMEM scratch, then scalar-read it — the ray
    gather fallback when dynamic-lane vector access is unavailable."""

    def kernel(x_ref, out_ref, sbuf, sem):
        cp = pltpu.make_async_copy(x_ref, sbuf, sem)
        cp.start()
        cp.wait()

        def body(i, acc):
            return acc + sbuf[i % 8, (i * 37) % 128]

        out_ref[0, 0] = jax.lax.fori_loop(0, 128, body, jnp.float32(0))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(x)
        expect = sum(float(np.asarray(x)[i % 8, (i * 37) % 128]) for i in range(128))
        ok = abs(float(np.asarray(out)[0, 0]) - expect) < 1e-3
        print(f"probe9 VMEM->SMEM DMA + scalar reads: {'PASS' if ok else 'BAD VALUE'}",
              flush=True)
    except Exception as e:
        print(f"probe9 VMEM->SMEM DMA: FAIL ({str(e)[:100]})", flush=True)


def probe10_scalar_mt_row(interpret):
    """Scalar-broadcast MT: ray components as SMEM scalars, triangles as
    (1, 128) lane vectors -> per-(ray, tri) t.  The tail fast path."""

    def kernel(rays_ref, tris_ref, out_ref):
        def one_ray(r, _):
            o = [rays_ref[r, k] for k in range(3)]
            d = [rays_ref[r, 3 + k] for k in range(3)]
            p0 = [tris_ref[k : k + 1, :] for k in range(3)]
            e1 = [tris_ref[3 + k : 4 + k, :] for k in range(3)]
            e2 = [tris_ref[6 + k : 7 + k, :] for k in range(3)]
            pv = [d[(k + 1) % 3] * e2[(k + 2) % 3] - d[(k + 2) % 3] * e2[(k + 1) % 3]
                  for k in range(3)]
            det = pv[0] * e1[0] + pv[1] * e1[1] + pv[2] * e1[2]
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tv = [o[k] - p0[k] for k in range(3)]
            uu = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv_det
            qv = [tv[(k + 1) % 3] * e1[(k + 2) % 3] - tv[(k + 2) % 3] * e1[(k + 1) % 3]
                  for k in range(3)]
            vv = (qv[0] * d[0] + qv[1] * d[1] + qv[2] * d[2]) * inv_det
            tt = (qv[0] * e2[0] + qv[1] * e2[1] + qv[2] * e2[2]) * inv_det
            valid = ((jnp.abs(det) > 1e-12) & (uu >= 0) & (vv >= 0)
                     & (uu + vv <= 1) & (tt > 1e-4))
            out_ref[pl.ds(r, 1), :] = jnp.where(valid, tt, jnp.inf)
            return 0

        jax.lax.fori_loop(0, 8, one_ray, 0)

    rng_ = np.random.default_rng(0)
    rays = np.zeros((8, 8), np.float32)
    rays[:, 0:3] = rng_.normal(size=(8, 3)) * 0.1
    rays[:, 3:6] = rng_.normal(size=(8, 3))
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    p0 = rng_.normal(size=(128, 3)).astype(np.float32) * 2
    e1 = rng_.normal(size=(128, 3)).astype(np.float32)
    e2 = rng_.normal(size=(128, 3)).astype(np.float32)
    tris = np.concatenate([p0.T, e1.T, e2.T], axis=0).astype(np.float32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(rays), jnp.asarray(tris))
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
        ok = np.allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-5)
        print(f"probe10 scalar-broadcast MT: {'PASS' if ok else 'BAD VALUE'}",
              flush=True)
    except Exception as e:
        print(f"probe10 scalar-broadcast MT: FAIL ({str(e)[:100]})", flush=True)


def probe11_drain_cost():
    """Cost of one vector->scalar drain (jnp.sum((8,128)) read as scalar)
    — the pattern the stream kernel leans on per visit."""
    for n_drains in (256, 2048):
        def kernel(x_ref, out_ref, n=n_drains):
            def body(i, acc):
                w = jnp.sum(x_ref[...]) + acc.astype(jnp.float32)

                @pl.when(w > -1.0)
                def _():
                    out_ref[0, i % 128] = w

                return acc + 1

            jax.lax.fori_loop(0, n, body, jnp.int32(0))

        f = jax.jit(
            lambda x, k=kernel: pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(x)
        )
        x0 = jnp.ones((8, 128), jnp.float32)
        jax.block_until_ready(f(x0))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0 + jnp.float32(i + 1)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"probe11 {n_drains} drains(+sum): {med*1e3:.2f} ms "
              f"({med/n_drains*1e9:.0f} ns/drain incl. floor)", flush=True)


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    probes = [
        ("probe2", lambda: probe2(interpret)),
        ("probe3", lambda: probe3(interpret)),
        ("probe8", lambda: probe8_smem_capacity(interpret)),
        ("probe9", lambda: probe9_vmem_to_smem_dma(interpret)),
        ("probe10", lambda: probe10_scalar_mt_row(interpret)),
        ("probe1", lambda: probe1(interpret)),
        ("probe5", lambda: probe5(interpret)),
    ]
    if not interpret:
        probes += [
            ("probe11", probe11_drain_cost),
            ("probe4", probe4_timing),
            ("probe6", probe6_timing),
            ("probe7", probe7_sort_gather),
        ]
    for name, fn in probes:
        try:
            fn()
        except Exception as e:
            print(f"{name}: FAIL ({str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
