"""Profile one render dispatch on the TPU and print a per-op time summary.

Usage: python scripts/profile_dispatch.py [size] [spp] [scene]
Writes the xplane trace to /tmp/vpt_profile and parses it with
jax.profiler.ProfileData (device op lanes), aggregating self-time by op name.
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import perspective
    from vpt_tpu.render.params import RenderFlags, default_params
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene import procedural

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    scene_name = sys.argv[3] if len(sys.argv) > 3 else "colonnade"

    scene = getattr(procedural, scene_name)()
    data, meta, aux = compile_scene(scene)
    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=8, max_medium_events=8)
    accum = jnp.zeros((size, size, 3), jnp.float32)

    out, segs = _render_step(
        data, meta, flags, params, jnp.uint32(1), (size, size), accum,
        jnp.int32(0), spp,
    )
    out.block_until_ready()
    print(f"segments per dispatch: {float(segs):.0f}")

    t0 = time.perf_counter()
    out, segs = _render_step(
        data, meta, flags, params, jnp.uint32(2), (size, size), out, jnp.int32(1), spp,
    )
    out.block_until_ready()
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1e3:.1f} ms  ({float(segs)/wall/1e6:.3f} M segs/s)")

    trace_dir = "/tmp/vpt_profile"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out, segs = _render_step(
            data, meta, flags, params, jnp.uint32(3), (size, size), out, jnp.int32(2), spp,
        )
        out.block_until_ready()

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane trace found")
        return
    pd = jax.profiler.ProfileData.from_file(paths[0])
    op_time = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                op_time[(lname, name)] += dur
    # Prefer the XLA Ops lane if present
    lanes = defaultdict(float)
    for (lname, name), t in op_time.items():
        lanes[lname] += t
    print("\nlanes:")
    for lname, t in sorted(lanes.items(), key=lambda kv: -kv[1]):
        print(f"  {lname}: {t:.1f} ms")

    # Aggregate by op name for each lane (the serial "XLA Ops" lane is the
    # one that reflects real device time; async lanes span their waits).
    for lane_sel in lanes:
        agg = defaultdict(float)
        count = defaultdict(int)
        for (lname, name), t in op_time.items():
            if lname == lane_sel:
                agg[name] += t
                count[name] += 1
        print(f"\ntop ops in '{lane_sel}' ({lanes[lane_sel]:.1f} ms total):")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {t:9.2f} ms  x{count[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
