"""Minimal reproducer: TWO stream-kernel instances in ONE XLA program.

The repo's known Mosaic pitfall: two DMA-pipelined Pallas instances in one
program abort/hang when the DMA block >= 16KB.  This calls intersect_stream
twice inside one jit (the render dispatch shape: main + shadow trace).
"""
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
print("built", flush=True)
# Serialize device transfers one leaf at a time: concurrent bulk device_put
# through the axon relay deadlocks intermittently.
leaves, treedef = jax.tree.flatten(cl)
moved = []
for leaf in leaves:
    leaf = jax.device_put(leaf)
    jax.block_until_ready(leaf)
    moved.append(leaf)
cl = jax.tree.unflatten(treedef, moved)
print("transferred", flush=True)

rng = np.random.default_rng(7)
n = 32768
lo = np.asarray(jnp.min(cl.group_min, axis=0)); hi = np.asarray(jnp.max(cl.group_max, axis=0))
o = ((lo+hi)/2 + (rng.uniform(-0.6, 0.6, (n,3)) * (hi-lo))).astype(np.float32)
d = rng.normal(size=(n,3)).astype(np.float32); d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o); d = jnp.asarray(d)

@jax.jit
def two(o, d, cl):
    h1 = intersect_stream(o, d, cl)
    # second instance fed from the first's output (like shadow-from-hit)
    o2 = o + d * jnp.maximum(h1.t, 0.1)[:, None] * 0.5
    h2 = intersect_stream(o2, -d, cl, anyhit=jnp.ones(o.shape[0], bool))
    return h1.t.sum() + h2.t.sum()

t0 = time.time()
v = float(two(o, d, cl))
print(f"TWO-INSTANCE OK in {time.time()-t0:.1f}s: {v}", flush=True)
