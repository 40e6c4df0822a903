"""Microbenchmark: lax.sort cost on the TPU at wavefront-relevant shapes.

The cluster-major trace design hinges on one payload-carrying ray sort per
bounce; this measures its device cost vs width and operand count, plus the
cost of the (N, G) slab-cull and a (rows, G) bit-table build.

Usage: python scripts/sort_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        # vary an input to defeat the relay execution cache
        a2 = [args[0] + jnp.float32(i + 1)] + list(args[1:])
        t0 = time.perf_counter()
        out = fn(*a2)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    key = jax.random.PRNGKey(0)

    for n in (131072, 262144, 786432):
        vals = jax.random.uniform(key, (12, n))
        keys_i = (jax.random.uniform(key, (n,)) * 200).astype(jnp.int32)

        for n_ops in (2, 5, 8, 12):
            @jax.jit
            def do_sort(v, k=None, m=n_ops):
                ops = [(v[0] + (0 if k is None else 0)).astype(jnp.float32)]
                kk = (v[0] * 200).astype(jnp.int32)
                cols = [kk] + [v[j] for j in range(1, m)]
                out = jax.lax.sort(tuple(cols), num_keys=1, is_stable=True)
                return out[1]

            t = timeit(do_sort, vals)
            print(f"sort n={n:7d} operands={n_ops:2d}: {t*1e3:7.2f} ms", flush=True)

        # slab cull (N, G) fused to (rows, G) bits
        for g in (163, 256):
            gmin = jax.random.uniform(key, (3, g))
            gmax = gmin + 0.3

            @jax.jit
            def cull(v, gmin=gmin, gmax=gmax, g=g):
                o = jnp.stack([v[0], v[1], v[2]], axis=-1)
                d = jnp.stack([v[3], v[4], v[5]], axis=-1)
                inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)
                tn = jnp.zeros((n, g), jnp.float32)
                tf = jnp.full((n, g), 1e9, jnp.float32)
                for ax in range(3):
                    s0 = (gmin[ax][None, :] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
                    s1 = (gmax[ax][None, :] - o[:, ax:ax+1]) * inv[:, ax:ax+1]
                    tn = jnp.maximum(tn, jnp.minimum(s0, s1))
                    tf = jnp.minimum(tf, jnp.maximum(s0, s1))
                enter = tn <= tf
                entry = jnp.where(enter, tn, jnp.inf)
                first = jnp.argmin(entry, axis=1).astype(jnp.int32)
                rows = enter.reshape(n // 128, 128, g).any(axis=1)
                rentry = entry.reshape(n // 128, 128, g).min(axis=1)
                return first, rows, rentry

            t = timeit(cull, vals)
            print(f"cull n={n:7d} G={g:3d}: {t*1e3:7.2f} ms", flush=True)
    print("done")


if __name__ == "__main__":
    main()
