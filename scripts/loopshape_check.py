"""Discriminate WHY lax.while_loop embedding slows the stream kernel ~50x.

Same 32K-ray bounce trace x4, three harness shapes in one process:
  a) unrolled — 4 sequential intersect_stream calls in ONE jit
  b) fori     — lax.fori_loop
  c) while    — lax.while_loop (the render-dispatch shape)

If (a) is fast and (b/c) slow, the regression is loop buffer logistics
(e.g. loop-state staging through an alternate memory space), not the
kernel.  Usage: python scripts/loopshape_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.accel.stream import intersect_stream
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def main():
    scene = procedural.colonnade()
    data, meta, aux = compile_scene(scene)
    cl = jax.device_put(data.clusters)
    jax.block_until_ready(cl)
    print("transferred", flush=True)

    rng = np.random.default_rng(7)
    n = 32768
    lo = np.asarray(jnp.min(cl.group_min, axis=0))
    hi = np.asarray(jnp.max(cl.group_max, axis=0))
    o = ((lo + hi) / 2 + (rng.uniform(-0.6, 0.6, (n, 3)) * (hi - lo))).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    def body_step(o2, acc):
        h = intersect_stream(o2, d, cl)
        o3 = o2 + d * 0.01 * jnp.maximum(h.t, 0.0)[:, None]
        return o3, acc + h.t.sum()

    @jax.jit
    def unrolled(o):
        acc = jnp.float32(0)
        o2 = o
        for _ in range(4):
            o2, acc = body_step(o2, acc)
        return acc

    @jax.jit
    def fori(o):
        def body(i, c):
            o2, acc = c
            return body_step(o2, acc)

        _, acc = jax.lax.fori_loop(0, 4, body, (o, jnp.float32(0)))
        return acc

    @jax.jit
    def wloop(o):
        def body(c):
            i, o2, acc = c
            o3, acc2 = body_step(o2, acc)
            return i + 1, o3, acc2

        _, _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                       (jnp.int32(0), o, jnp.float32(0)))
        return acc

    for name, fn in (("unrolled", unrolled), ("fori", fori), ("while", wloop)):
        v = float(fn(o))  # compile
        ts = []
        for i in range(3):
            t0 = time.time()
            v = float(fn(o + jnp.float32((i + 1) * 1e-3)))
            ts.append(time.time() - t0)
        print(f"{name:9s} median {np.median(ts):.2f}s  (all {['%.2f' % t for t in ts]})  v={v:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
