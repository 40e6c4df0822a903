"""Probe: is per-dispatch wall dominated by relay per-call overhead that
scales with INPUT SIZE rather than device work?

Times three trivial jitted functions with varying seed inputs:
  a) tiny input (one scalar)
  b) the full compiled colonnade SceneData pytree as input (~tens of MB)
  c) just the big tris_rk array

If (b)/(c) cost seconds while (a) is ~30 ms, the relay pays a per-call
cost proportional to operand bytes (hashing/serialization), and the fix
is fewer/smaller per-dispatch operands, not kernel work.

Usage: python scripts/relay_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3):
    out = fn(jnp.uint32(0), *args)
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        out = fn(jnp.uint32(i + 1), *args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return ts


def main():
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene.procedural import colonnade

    data, meta, aux = compile_scene(colonnade())
    data = jax.device_put(data)
    jax.block_until_ready(data)

    nbytes = sum(x.nbytes for x in jax.tree.leaves(data) if hasattr(x, "nbytes"))
    print(f"SceneData total bytes: {nbytes/1e6:.1f} MB", flush=True)

    @jax.jit
    def tiny(seed):
        return seed + jnp.uint32(1)

    @jax.jit
    def with_scene(seed, d):
        return seed.astype(jnp.float32) + d.clusters.tris_rk[0, 0, 0]

    @jax.jit
    def with_tris(seed, t):
        return seed.astype(jnp.float32) + t[0, 0, 0]

    print("tiny:      ", [f"{t*1e3:.1f} ms" for t in timeit(tiny)], flush=True)
    print("with_scene:", [f"{t*1e3:.1f} ms" for t in timeit(with_scene, data)], flush=True)
    print("with_tris: ", [f"{t*1e3:.1f} ms" for t in timeit(with_tris, data.clusters.tris_rk)], flush=True)

    # and a moderately heavy real op on big arrays, seed-varied
    @jax.jit
    def heavy(seed, t):
        return jnp.sum(t * (seed.astype(jnp.float32) + 1.0))

    print("sum(tris): ", [f"{t*1e3:.1f} ms" for t in timeit(heavy, data.clusters.tris_rk)], flush=True)


if __name__ == "__main__":
    main()
