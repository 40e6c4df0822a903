"""Cost-model sweep of stream-trace sort-key variants.

For the synthetic diffuse-bounce wavefront (the expensive case), measures
how supertile visits / entering rows / entering-ray lane fill respond to
deeper or cheaper sort keys, WITHOUT running the kernel:

  2lvl    — (g0, g1)                         [current production key]
  2+oct   — (g0, g1, 3-bit direction octant) [free: no extra (N,G) pass]
  2+dq6   — (g0, g1, 6-bit quantized dir)    [free]
  3lvl    — (g0, g1, g2)                     [one extra (N,G) argmin pass]
  3+oct   — (g0, g1, g2, octant)

Usage: python scripts/key_sweep.py [scene] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vpt_tpu.accel.cluster import _slab_tn_tf
from vpt_tpu.accel.stream import BAND, SUPER_ROWS, TILES_PER_BAND
from vpt_tpu.accel.visit_kernel import GROUP_SIZE
from vpt_tpu.core.camera import perspective
from vpt_tpu.core.tiling import tiled_pixel_order
from vpt_tpu.render.params import default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def ray_group_entries(o, d, tmax, cl):
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin = jnp.concatenate([cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    gmax = jnp.concatenate([cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    n = o.shape[0]
    tn, tf = _slab_tn_tf(o[None], d[None], tmax[None], gmin, gmax, 1e-4)
    ent = np.asarray(jnp.where(tn <= tf, tn, jnp.inf)).reshape(n, g_padded)
    return ent, g_padded


def stats_for_order(order, ent, n_real):
    """Visit statistics given a ray permutation."""
    e = ent[order]
    n, gp = e.shape
    fin = np.isfinite(e)
    st = n // (SUPER_ROWS * 128)
    f3 = fin.reshape(st, SUPER_ROWS, 128, gp)
    st_any = f3.any(axis=(1, 2))          # (st, gp) supertile visits
    row_any = f3.any(axis=2)              # (st, rows, gp)
    visits = int(st_any.sum())
    rows = int(row_any.sum())
    rays = int(fin.sum())                 # (ray, group) incidences
    # lane fill: entering rays / (128 * entering rows)
    lane_fill = rays / max(rows * 128, 1)
    row_fill = rows / max(visits * SUPER_ROWS, 1)
    return visits, rows, lane_fill, row_fill


def key_order(ent, comps):
    """Lexicographic sort order over integer component arrays."""
    idx = np.lexsort(tuple(reversed(comps)))
    return idx


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    scene = getattr(procedural, scene_name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))

    # primary rays
    from vpt_tpu.core import rng
    from vpt_tpu.core.camera import generate_primary_rays

    n = size * size
    pxy, pidx, sct, padded = tiled_pixel_order(size, size)
    st = rng.seed(jnp.asarray(pidx), jnp.uint32(0), jnp.uint32(7))
    st, o, d = generate_primary_rays(
        params.view_inverse, params.proj_inverse, jnp.asarray(pxy), (size, size),
        st, params.focus_distance, params.dof_strength,
    )
    o = np.asarray(o)
    d = np.asarray(d)

    # synthetic diffuse bounce: intersect brute-force-ish via the entry t of
    # the nearest group as a stand-in hit distance, cosine-bounce around the
    # inverted direction (cheap, matches stream_stats' approach)
    rs = np.random.RandomState(1)
    ent0, gp = ray_group_entries(jnp.asarray(o), jnp.asarray(d), jnp.full(n, 1e8, np.float32), cl)
    t0 = np.where(np.isfinite(ent0).any(1), np.nanmin(np.where(np.isfinite(ent0), ent0, np.nan), 1), -1.0)
    hitm = t0 > 0
    ob = (o + d * (t0[:, None] * 0.97))[hitm]
    db = rs.normal(size=ob.shape).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    nb = ob.shape[0]

    for label, (oo, dd) in (("primary", (o, d)), ("bounce", (ob, db))):
        m = oo.shape[0]
        pad = (-m) % BAND
        if pad:
            oo = np.concatenate([oo, np.full((pad, 3), 1e9, np.float32)])
            dd = np.concatenate([dd, np.tile(np.array([[1, 0, 0]], np.float32), (pad, 1))])
        tmax = np.full(oo.shape[0], 1e8, np.float32)
        tmax[m:] = 1e-4
        ent, gp = ray_group_entries(jnp.asarray(oo), jnp.asarray(dd), jnp.asarray(tmax), cl)

        sent = gp
        order_ids = np.argsort(np.where(np.isfinite(ent), ent, np.inf), axis=1)
        e_sorted = np.take_along_axis(ent, order_ids, axis=1)
        fin = np.isfinite(e_sorted)
        g0 = np.where(fin[:, 0], order_ids[:, 0], sent)
        g1 = np.where(fin[:, 1], order_ids[:, 1], sent)
        g2 = np.where(fin[:, 2], order_ids[:, 2], sent)
        oct3 = ((dd[:, 0] > 0).astype(np.int64) * 4
                + (dd[:, 1] > 0).astype(np.int64) * 2
                + (dd[:, 2] > 0).astype(np.int64))
        q = np.clip(((dd + 1) * 2).astype(np.int64), 0, 3)  # 2 bits/axis
        dq6 = q[:, 0] * 16 + q[:, 1] * 4 + q[:, 2]

        variants = {
            "2lvl ": (g0, g1),
            "2+oct": (g0, g1, oct3),
            "2+dq6": (g0, g1, dq6),
            "3lvl ": (g0, g1, g2),
            "3+oct": (g0, g1, g2, oct3),
            "3+dq6": (g0, g1, g2, dq6),
        }
        print(f"--- {label}: n={m} rays, gp={gp} ---")
        for name, comps in variants.items():
            order = key_order(ent, [c.astype(np.int64) for c in comps])
            visits, rows, lane_fill, row_fill = stats_for_order(order, ent, m)
            print(
                f"  {name}: supertile visits {visits:6d}  rows {rows:7d}  "
                f"row-fill {row_fill:.2f}  lane-fill {lane_fill:.3f}"
            )


if __name__ == "__main__":
    main()
