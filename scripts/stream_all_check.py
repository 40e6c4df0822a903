"""One-process sequential validation of the stream kernel: while-loop
wrapping, repeated executions, then real render dispatches."""
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
leaves, treedef = jax.tree.flatten(data)
moved = []
for leaf in leaves:
    leaf = jax.device_put(leaf); jax.block_until_ready(leaf); moved.append(leaf)
data = jax.tree.unflatten(treedef, moved)
cl = data.clusters
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

for i in range(3):
    t0 = time.time()
    v = float(loop(o + jnp.float32(i * 1e-3), d, cl))
    print(f"WHILE-LOOP exec{i} OK in {time.time()-t0:.1f}s: {v}", flush=True)

# Real render dispatches
from vpt_tpu.api import _render_step
from vpt_tpu.core.camera import perspective
from vpt_tpu.render.params import RenderFlags, default_params

view = aux["camera_view"]
proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
params = default_params(np.linalg.inv(view), np.linalg.inv(proj))
flags = RenderFlags(max_depth=8, max_medium_events=8)
size, spp = 256, 2
accum = jnp.zeros((size, size, 3), jnp.float32)
t0 = time.time()
out, segs = _render_step(data, meta, flags, params, jnp.uint32(1), (size, size), accum, jnp.int32(0), spp)
out.block_until_ready()
print(f"render compile+first: {time.time()-t0:.1f}s  segs={float(segs):.0f}", flush=True)
for i in range(3):
    t0 = time.time()
    out, segs = _render_step(data, meta, flags, params, jnp.uint32(2+i), (size, size), out, jnp.int32(1+i), spp)
    out.block_until_ready()
    dt = time.time() - t0
    print(f"render dispatch {i}: {dt:.2f}s  {float(segs)/dt/1e6:.3f} M segs/s", flush=True)
print("ALL OK", flush=True)
