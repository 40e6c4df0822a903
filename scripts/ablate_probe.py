"""Stream-kernel stage attribution on chip via VPT_STREAM_ABLATE.

Run three times (VPT_STREAM_ABLATE= | norows | nomt) and diff the medians:
  full - nomt    = MT blocks
  nomt - norows  = row sub-slabs (+ sbits drains)
  norows - empty = cluster slabs (+ rbits drains)

Usage: VPT_STREAM_ABLATE=nomt python scripts/ablate_probe.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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
    act = jnp.ones(n, bool)

    def timed(name, fn):
        # The axon relay caches executions keyed on (executable, inputs) —
        # vary an input every call or the repetitions measure the cache
        # (PERF.md gotcha).
        jax.block_until_ready(fn(0))
        ts = []
        for i in range(1, 5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(i))
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s} median {np.median(ts)*1e3:8.1f} ms", flush=True)

    mode = os.environ.get("VPT_STREAM_ABLATE", "") or "full"
    print(f"ablate={mode}  N={n}", flush=True)
    eps = jnp.float32(1e-5)
    timed(f"{mode} primary", lambda i: intersect_stream(
        origin + eps * i, direction, cl, active=act))

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    lo = jnp.min(cl.group_min, axis=0)
    hi = jnp.max(cl.group_max, axis=0)
    ro = jax.block_until_ready(lo + (hi - lo) * jax.random.uniform(k1, (n, 3)))
    rd = jax.random.normal(k2, (n, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    timed(f"{mode} bounce", lambda i: intersect_stream(
        ro + eps * i, rd, cl, active=act))


if __name__ == "__main__":
    main()
