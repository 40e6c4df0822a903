"""Cost-model statistics for the stream (cluster-major) trace on CPU.

For a realistic wavefront (primary rays + synthetic diffuse bounce), runs
the stream path's cull tables and reports per-band candidate groups,
member-cluster DMA visits, supertile visits, entering 128-ray rows, and a
time model (DMA latency vs MT flops) so kernel changes can be sized.

Usage: python scripts/stream_stats.py [scene] [size]
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


def stats(name, origin, direction, cl):
    n0 = origin.shape[0]
    pad = (-n0) % BAND
    if pad:
        origin = np.concatenate([origin, np.full((pad, 3), 1e9, np.float32)])
        direction = np.concatenate([direction, np.tile(np.array([[1.0, 0, 0]], np.float32), (pad, 1))])
    n = origin.shape[0]
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate([cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    gmax_pad = jnp.concatenate([cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    tmax = np.full(n, 1e8, np.float32)
    tmax[n0:] = 1e-4

    o = jnp.asarray(origin)
    d = jnp.asarray(direction)

    # sort keys (first, second)
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
    o = o[order]
    d = d[order]
    tmax_s = tmax[order]

    tn, tf = _slab_tn_tf(
        o.reshape(-1, 128, 3), d.reshape(-1, 128, 3),
        jnp.asarray(tmax_s).reshape(-1, 128), gmin_pad, gmax_pad, 1e-4,
    )
    enter = np.asarray(tn <= tf)  # (rows, 128, Gp)
    row_any = enter.any(axis=1)   # (rows, Gp)
    st_any = row_any.reshape(-1, SUPER_ROWS, g_padded).any(axis=1)  # (S, Gp)
    b = n // BAND
    band_groups = st_any.reshape(b, TILES_PER_BAND, g_padded).any(axis=1)  # (B, Gp)

    cnt = np.asarray(cl.count)
    c = cnt.shape[0]
    live_members = np.zeros(b)
    st_visits = np.zeros(b)
    row_visits = np.zeros(b)
    for bi in range(b):
        gs = np.nonzero(band_groups[bi])[0]
        gs = gs[gs < g]
        n_members = 0
        stv = 0
        rowv = 0
        st_band = st_any.reshape(b, TILES_PER_BAND, g_padded)[bi]  # (T, Gp)
        row_band = row_any.reshape(b, TILES_PER_BAND, SUPER_ROWS, g_padded)[bi]
        for gi in gs:
            members = np.arange(gi * GROUP_SIZE, (gi + 1) * GROUP_SIZE)
            members = members[(members < c)]
            members = members[cnt[members] > 0]
            n_members += len(members)
            # supertile visits = popcount of the group's word x members
            stv += st_band[:, gi].sum() * len(members)
            rowv += row_band[:, :, gi].sum() * len(members)
        live_members[bi] = n_members
        st_visits[bi] = stv
        row_visits[bi] = rowv

    per_ray = enter.sum(axis=(1, 2)) / 128  # mean groups per ray approx
    print(f"--- {name}: n={n0} rays, {b} bands, G={g} ---")
    print(f"  groups entered per ray (mean):  {np.asarray(enter.any(axis=1).sum(axis=1)).mean():.2f}")
    print(f"  candidate groups per band:      mean {band_groups[:, :g].sum(axis=1).mean():.1f}")
    print(f"  member DMA visits per band:     mean {live_members.mean():.1f}  total {live_members.sum():.0f}")
    print(f"  supertile visits per band:      mean {st_visits.mean():.1f}")
    print(f"  row visits per band (pre-slab): mean {row_visits.mean():.1f}")
    dma_us = live_members.sum() * 3.0
    gdma_us = band_groups[:, :g].sum() * 3.0
    mt_us = row_visits.sum() * 8 * 32 * 128 * 40 / 4e12 * 1e6
    print(f"  time model: member DMA latency @3us = {dma_us/1e3:.2f} ms; "
          f"GROUP DMA latency (one copy per candidate group) = {gdma_us/1e3:.2f} ms; "
          f"MT rows (8 subs) @4TF/s = {mt_us/1e3:.2f} ms per trace")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(np.asarray(aux["camera_view"])), np.linalg.inv(proj))

    pxy, pidx, sct, padded = tiled_pixel_order(size, size)
    from vpt_tpu.core import rng as rngmod
    from vpt_tpu.core.camera import generate_primary_rays

    st = rngmod.seed(jnp.asarray(pidx), jnp.uint32(0), jnp.uint32(1))
    st, o, d = generate_primary_rays(
        params.view_inverse, params.proj_inverse, jnp.asarray(pxy), (size, size), st,
        params.focus_distance, params.dof_strength,
    )
    o = np.asarray(o)
    d = np.asarray(d)
    stats("primary", o, d, cl)

    # synthetic diffuse bounce: trace to first hit via the XLA fallback,
    # then cosine-scatter around the (geometric) normal
    from vpt_tpu.accel.cluster import intersect_clusters

    hit = intersect_clusters(jnp.asarray(o), jnp.asarray(d), cl, use_pallas=False)
    t = np.asarray(hit.t)
    has = t > 0
    rng = np.random.default_rng(5)
    p = o + d * np.maximum(t, 0.1)[:, None] * 0.999
    nd = rng.normal(size=d.shape).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    nd = np.where((nd * d).sum(1, keepdims=True) > 0, -nd, nd)  # roughly away
    stats("diffuse-bounce", p[has], nd[has], cl)


if __name__ == "__main__":
    main()
