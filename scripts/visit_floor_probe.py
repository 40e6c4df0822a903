"""Per-visit orchestration floor of the stream/occlude kernels.

Times intersect_stream / occlude_stream on the colonnade primary wavefront
in three configurations:

  full    — the real trace (slab + MT work),
  empty   — identical tables but every cluster's `count` zeroed: the
            kernel walks the same candidate loop and whole-group DMAs but
            every member skips at the `cnt > 0` scalar test.  This is the
            pure candidate-loop + DMA + scalar-orchestration floor.
  noscene — `bits` forced to zero via inactive rays: measures the XLA-side
            cull/sort/unsort envelope around an idle kernel.

The gap full-empty is vector work; empty-noscene is in-kernel
orchestration + DMA; noscene is the XLA envelope.  Drives the schedule
decisions recorded in PERF.md.

Usage: python scripts/visit_floor_probe.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.accel.occlude import occlude_stream
    from vpt_tpu.accel.stream import intersect_stream
    from vpt_tpu.core.camera import generate_primary_rays, perspective
    from vpt_tpu.core import rng
    from vpt_tpu.render.params import default_params
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene.procedural import colonnade

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = size * size
    scene = colonnade()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))

    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    pixel_xy = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32))
    pix = jnp.asarray((xs.reshape(-1) + size * ys.reshape(-1)).astype(np.uint32))
    state = rng.seed(pix, jnp.uint32(0), jnp.uint32(1))
    _, origin, direction = generate_primary_rays(
        params.view_inverse, params.proj_inverse, pixel_xy, (size, size), state,
        params.focus_distance, params.dof_strength,
    )
    origin = jax.block_until_ready(origin)

    cl_empty = cl._replace(count=jnp.zeros_like(cl.count))

    def timed(name, fn, *args, **kw):
        out = jax.block_until_ready(fn(*args, **kw))  # compile
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kw))
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} median {np.median(ts)*1e3:8.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)
        return out

    act = jnp.ones(n, bool)
    print(f"N = {n} primary rays, {int(cl.count.sum())} tris, "
          f"{cl.group_min.shape[0]} groups", flush=True)
    timed("stream full", lambda: intersect_stream(origin, direction, cl, active=act))
    timed("stream empty-clusters", lambda: intersect_stream(origin, direction, cl_empty, active=act))
    timed("stream inactive-rays", lambda: intersect_stream(
        origin, direction, cl, active=jnp.zeros(n, bool)))
    timed("occlude full", lambda: occlude_stream(origin, direction, cl, active=act))
    timed("occlude empty-clusters", lambda: occlude_stream(origin, direction, cl_empty, active=act))

    # Bounce-like incoherent load: random origins inside the scene, random dirs
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    lo = jnp.min(cl.group_min, axis=0)
    hi = jnp.max(cl.group_max, axis=0)
    ro = lo + (hi - lo) * jax.random.uniform(k1, (n, 3))
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jax.block_until_ready(ro)
    timed("stream bounce-like", lambda: intersect_stream(ro, rd, cl, active=act))
    timed("occlude bounce-like", lambda: occlude_stream(ro, rd, cl, active=act))


if __name__ == "__main__":
    main()
