"""Per-supertile candidate-group distribution for the conveyor schedule.

The conveyor grid gives each 1024-ray supertile K_SLOTS items; candidates
beyond that run in the (slow, single-buffered) continuation loop.  This
prints the ncand distribution for a realistic wavefront so K_SLOTS and the
overflow rate can be sized, plus how far down the sorted candidate list
rays actually find their hits (post-termination useful depth).

Usage: python scripts/conveyor_stats.py [scene] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vpt_tpu.accel.cluster import _slab_tn_tf
from vpt_tpu.accel.conveyor import SUPER_ROWS
from vpt_tpu.core.camera import perspective
from vpt_tpu.core.tiling import tiled_pixel_order
from vpt_tpu.render.params import default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def stats(name, origin, direction, cl):
    super_n = SUPER_ROWS * 128
    n0 = origin.shape[0]
    pad = (-n0) % super_n
    if pad:
        origin = np.concatenate(
            [origin, np.full((pad, 3), 1e9, np.float32)]
        )
        direction = np.concatenate(
            [direction,
             np.tile(np.array([[1.0, 0, 0]], np.float32), (pad, 1))]
        )
    n = origin.shape[0]
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate(
        [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    tmax = np.full(n, 1e8, np.float32)
    tmax[n0:] = 1e-4

    o = jnp.asarray(origin)
    d = jnp.asarray(direction)

    tn0, tf0 = _slab_tn_tf(
        o.reshape(-1, 128, 3), d.reshape(-1, 128, 3),
        jnp.asarray(tmax).reshape(-1, 128), gmin_pad, gmax_pad, 1e-4,
    )
    ent = np.asarray(jnp.where(tn0 <= tf0, tn0, jnp.inf)).reshape(n, g_padded)
    first = ent.argmin(axis=1)
    v1 = ent.min(axis=1)
    ent2 = ent.copy()
    ent2[np.arange(n), first] = np.inf
    second = ent2.argmin(axis=1)
    v2 = ent2.min(axis=1)
    first = np.where(np.isfinite(v1), first, g_padded)
    second = np.where(np.isfinite(v2), second, g_padded)
    key = first * (g_padded + 1) + second
    order = np.argsort(key, kind="stable")
    o = np.asarray(o)[order]
    d = np.asarray(d)[order]
    tmax_s = tmax[order]

    tn, tf = _slab_tn_tf(
        jnp.asarray(o).reshape(-1, 128, 3), jnp.asarray(d).reshape(-1, 128, 3),
        jnp.asarray(tmax_s).reshape(-1, 128), gmin_pad, gmax_pad, 1e-4,
    )
    enter = np.asarray(tn <= tf).reshape(n, g_padded)
    st_any = enter.reshape(-1, super_n, g_padded).any(axis=1)[:, :g]  # (S, g)
    ncand = st_any.sum(axis=1)
    s_real = (tmax_s.reshape(-1, super_n) > 1e-3).any(axis=1)
    nc = ncand[s_real]
    print(f"--- {name}: n={n0} rays, S={s_real.sum()} live supertiles ---")
    qs = np.percentile(nc, [50, 75, 90, 95, 99, 100])
    print(f"  ncand per supertile: mean {nc.mean():.1f}  "
          f"p50/p75/p90/p95/p99/max = {[int(q) for q in qs]}")
    for k in (8, 16, 24, 32, 48, 64):
        ovf = (nc > k).mean()
        tail = np.maximum(nc - k, 0).sum()
        print(f"  K={k:3d}: overflow supertiles {ovf*100:5.1f}%  "
              f"tail items {tail}  grid items {len(nc)*k}")
    print(f"  total (supertile,group) incidences: {nc.sum()}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(
        np.linalg.inv(np.asarray(aux["camera_view"])), np.linalg.inv(proj)
    )

    pxy, pidx, sct, padded = tiled_pixel_order(size, size)
    from vpt_tpu.core import rng as rngmod
    from vpt_tpu.core.camera import generate_primary_rays

    st = rngmod.seed(jnp.asarray(pidx), jnp.uint32(0), jnp.uint32(1))
    st, o, d = generate_primary_rays(
        params.view_inverse, params.proj_inverse, jnp.asarray(pxy),
        (size, size), st, params.focus_distance, params.dof_strength,
    )
    o = np.asarray(o)
    d = np.asarray(d)
    stats("primary", o, d, cl)

    # synthetic diffuse bounce from the first hit
    from vpt_tpu.accel.cluster import intersect_clusters

    h = intersect_clusters(
        jnp.asarray(o), jnp.asarray(d), cl, use_pallas=False
    )
    t = np.asarray(h.t)
    hitm = t >= 0
    p = o[hitm] + d[hitm] * t[hitm][:, None] * 0.999
    rng = np.random.default_rng(3)
    nd = rng.normal(size=p.shape).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    stats("bounce", p.astype(np.float32), nd, cl)


if __name__ == "__main__":
    main()
