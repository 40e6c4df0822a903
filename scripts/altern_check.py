"""Does ALTERNATING the two big Pallas kernels inside one loop body
reproduce the 11.9s-dispatch slowness that a single-kernel loop lacks?

Three legs (one process, separate jits):
  a) stream only        — body: 1x intersect_stream        (baseline)
  b) stream x2          — body: 2x intersect_stream        (call count)
  c) stream + occlude   — body: both kernels               (alternation)

If (c) >> (b) ~ 2x(a) steady-state, per-invocation cost is tied to
switching kernels (program reload / IMEM thrash), not call count.

Usage: python scripts/altern_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.accel.occlude import occlude_stream
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

    @jax.jit
    def stream_only(o):
        def body(c):
            i, o2, acc = c
            h = intersect_stream(o2, d, cl)
            o3 = o2 + d * 0.01 * jnp.maximum(h.t, 0.0)[:, None]
            return i + 1, o3, acc + h.t.sum()

        _, _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                       (jnp.int32(0), o, jnp.float32(0)))
        return acc

    @jax.jit
    def stream_x2(o):
        def body(c):
            i, o2, acc = c
            h = intersect_stream(o2, d, cl)
            h2 = intersect_stream(o2 + 0.001, d, cl)
            o3 = o2 + d * 0.01 * jnp.maximum(h.t, 0.0)[:, None]
            return i + 1, o3, acc + h.t.sum() + h2.t.sum()

        _, _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                       (jnp.int32(0), o, jnp.float32(0)))
        return acc

    @jax.jit
    def alternating(o):
        def body(c):
            i, o2, acc = c
            h = intersect_stream(o2, d, cl)
            blocked = occlude_stream(o2, d, cl, t_max=10.0)
            o3 = o2 + d * 0.01 * jnp.maximum(h.t, 0.0)[:, None]
            return i + 1, o3, acc + h.t.sum() + blocked.sum()

        _, _, acc = jax.lax.while_loop(lambda c: c[0] < 4, body,
                                       (jnp.int32(0), o, jnp.float32(0)))
        return acc

    for name, fn in (("stream-only", stream_only), ("stream-x2", stream_x2),
                     ("alternating", alternating)):
        v = float(fn(o))  # compile
        ts = []
        for i in range(4):
            t0 = time.time()
            v = float(fn(o + jnp.float32((i + 1) * 1e-3)))
            ts.append(time.time() - t0)
        print(f"{name:12s} median {np.median(ts):.2f}s  "
              f"(all {['%.2f' % t for t in ts]})  v={v:.1f}", flush=True)


if __name__ == "__main__":
    main()
