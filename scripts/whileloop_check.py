"""Reproducer: stream kernel invoked repeatedly inside lax.while_loop
(the render dispatch shape). Single instance, 4 iterations."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.accel.stream import intersect_stream
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural

scene = procedural.colonnade()
data, meta, aux = compile_scene(scene)
cl = data.clusters
leaves, treedef = jax.tree.flatten(cl)
moved = []
for leaf in leaves:
    leaf = jax.device_put(leaf); jax.block_until_ready(leaf); moved.append(leaf)
cl = jax.tree.unflatten(treedef, moved)
print("transferred", flush=True)

rng = np.random.default_rng(7)
n = 32768
lo = np.asarray(jnp.min(cl.group_min, axis=0)); hi = np.asarray(jnp.max(cl.group_max, axis=0))
o = ((lo+hi)/2 + (rng.uniform(-0.6, 0.6, (n,3)) * (hi-lo))).astype(np.float32)
d = rng.normal(size=(n,3)).astype(np.float32); d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o); d = jnp.asarray(d)

@jax.jit
def loop(o, d, cl):
    def body(c):
        i, o2, acc = c
        h = intersect_stream(o2, d, cl)
        o3 = o2 + d * 0.01 * jnp.maximum(h.t, 0.0)[:, None]
        return i + 1, o3, acc + h.t.sum()
    def cond(c):
        return c[0] < 4
    _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), o, jnp.float32(0)))
    return acc

t0 = time.time()
v = float(loop(o, d, cl))
print(f"WHILE-LOOP exec1 OK in {time.time()-t0:.1f}s: {v}", flush=True)
t0 = time.time()
v2 = float(loop(o + jnp.float32(1e-3), d, cl))
print(f"WHILE-LOOP exec2 OK in {time.time()-t0:.1f}s: {v2}", flush=True)
t0 = time.time()
v3 = float(loop(o + jnp.float32(2e-3), d, cl))
print(f"WHILE-LOOP exec3 OK in {time.time()-t0:.1f}s: {v3}", flush=True)
