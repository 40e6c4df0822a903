"""Bounce-trace stage attribution under VPT_STREAM_ABLATE (r5 probe).

Times ONLY the incoherent bounce-like stream trace (the in-dispatch
dominant load) so one run = one compile.  Run three times:

  python scripts/bounce_ablate.py                          # full
  VPT_STREAM_ABLATE=norows python scripts/bounce_ablate.py # pass-1 + drains
  VPT_STREAM_ABLATE=nomt   python scripts/bounce_ablate.py # + row sub-slabs

full-nomt = MT blocks; nomt-norows = row sub-slabs; norows-(envelope) =
pass-1 slabs + word/cap drains + DMA + scalar orchestration.
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
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene.procedural import colonnade

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = size * size
    scene = colonnade()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters

    # The axon relay caches executions keyed on (executable, inputs) —
    # vary the wavefront every call or this measures the cache (PERF.md).
    # Origins must sit ON SURFACES (primary hits), not uniformly in the
    # volume: surface bounces enter ~12 groups/ray vs ~3 for volume points
    # (stream_stats) and are what the in-dispatch kernel actually sees.
    from vpt_tpu.core.camera import generate_primary_rays, perspective
    from vpt_tpu.core import rng as rngmod
    from vpt_tpu.render.params import default_params

    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    pxy = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32))
    pix = jnp.asarray((xs.reshape(-1) + size * ys.reshape(-1)).astype(np.uint32))
    st = rngmod.seed(pix, jnp.uint32(0), jnp.uint32(1))
    _, po, pd = generate_primary_rays(
        params.view_inverse, params.proj_inverse, pxy, (size, size), st,
        params.focus_distance, params.dof_strength,
    )
    hit = intersect_stream(po, pd, cl)
    t = jnp.where(hit.t > 0, hit.t, 1.0)
    surf = po + pd * (t[:, None] * 0.999)
    act = jnp.ones(n, bool)
    waves = []
    for i in range(6):
        rd = jax.random.normal(jax.random.PRNGKey(i), (n, 3))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        rd = jnp.where((rd * pd).sum(1, keepdims=True) > 0, -rd, rd)
        waves.append((jax.block_until_ready(surf), jax.block_until_ready(rd)))

    mode = os.environ.get("VPT_STREAM_ABLATE", "") or "full"
    fn = lambda ro, rd: intersect_stream(ro, rd, cl, active=act)
    jax.block_until_ready(fn(*waves[0]))  # compile
    ts = []
    sums = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        h = fn(*waves[i])
        # Force full materialization on the HOST inside the timed region:
        # relay-side block_until_ready alone has been observed to return
        # before the execution is really paid for (8 ms "traces" whose
        # in-dispatch cost is 300+ ms).
        s = float(np.asarray(h.t).sum()) + float(np.asarray(h.tri).sum())
        ts.append(time.perf_counter() - t0)
        sums.append(s)
    print(f"stream bounce [{mode:6s}]  median {np.median(ts)*1e3:8.1f} ms  "
          f"(min {min(ts)*1e3:.1f})  checksums={sums}", flush=True)


if __name__ == "__main__":
    main()
