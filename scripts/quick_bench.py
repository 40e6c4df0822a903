"""One-config timing: compile + a few dispatches on the bench scene.

Usage: [env knobs] python scripts/quick_bench.py [size] [spp] [scene]
Prints sustained M segs/s per dispatch.  Knobs: VPT_CLUSTER_SIZE,
VPT_SORT_KEY, VPT_SORT_RAYS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import perspective
    from vpt_tpu.render.params import RenderFlags, default_params
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene import procedural

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    name = sys.argv[3] if len(sys.argv) > 3 else "colonnade"
    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(aux["camera_view"]), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=8, max_medium_events=8)
    accum = jnp.zeros((size, size, 3), jnp.float32)
    t0 = time.time()
    out, segs = _render_step(
        data, meta, flags, params, jnp.uint32(1), (size, size), accum, jnp.int32(0), spp
    )
    out.block_until_ready()
    print(f"compile+first: {time.time()-t0:.1f}s  clusters={data.clusters.n_clusters}", flush=True)
    rates = []
    for i in range(3):
        t0 = time.time()
        out, segs = _render_step(
            data, meta, flags, params, jnp.uint32(2 + i), (size, size), out,
            jnp.int32(1 + i), spp,
        )
        out.block_until_ready()
        dt = time.time() - t0
        rates.append(float(segs) / dt / 1e6)
        print(f"dispatch {i}: {dt:.2f}s  {rates[-1]:.3f} M segs/s", flush=True)
    print(f"RESULT {os.environ.get('VPT_CLUSTER_SIZE','1024')}/{os.environ.get('VPT_SORT_KEY','fs')}: "
          f"median {np.median(rates):.3f} M segs/s", flush=True)


if __name__ == "__main__":
    main()
