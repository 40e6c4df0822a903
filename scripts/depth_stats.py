"""Exact per-ray front-to-back visit depth for the rounds design.

Simulates ideal per-ray traversal: groups in entry order, stop when the
next entry exceeds the running best (which tightens to the final hit t
once the containing group is processed).  The visit-count distribution
sets the rounds/fallback split: R rounds of dense processing cover rays
needing <= R visits; the rest go to a compacted fallback.

Usage: python scripts/depth_stats.py [scene] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vpt_tpu.accel.cluster import _slab_tn_tf, intersect_clusters
from vpt_tpu.accel.visit_kernel import GROUP_SIZE
from vpt_tpu.core.camera import perspective
from vpt_tpu.core.tiling import tiled_pixel_order
from vpt_tpu.render.params import default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def stats(name, origin, direction, cl):
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

    h = intersect_clusters(
        jnp.asarray(origin), jnp.asarray(direction), cl, use_pallas=False
    )
    t_fin = np.asarray(h.t)
    tri_fin = np.asarray(h.tri)

    # hit group per ray: cluster whose [start, start+count) contains tri
    start = np.asarray(cl.start)
    cnt = np.asarray(cl.count)
    # clusters sorted by start (they already are, per mesh); map via search
    ordc = np.argsort(start, kind="stable")
    s_sorted = start[ordc]
    cid = np.full(n, -1, np.int64)
    hitm = tri_fin >= 0
    pos = np.searchsorted(s_sorted, tri_fin[hitm], side="right") - 1
    cand = ordc[np.clip(pos, 0, len(ordc) - 1)]
    ok = (tri_fin[hitm] >= start[cand]) & (tri_fin[hitm] < start[cand] + cnt[cand])
    cidh = np.where(ok, cand, -1)
    cid[hitm] = cidh
    hit_grp = np.where(cid >= 0, cid // GROUP_SIZE, -1)

    tn0, tf0 = _slab_tn_tf(
        jnp.asarray(origin).reshape(-1, 128, 3),
        jnp.asarray(direction).reshape(-1, 128, 3),
        jnp.asarray(tmax).reshape(-1, 128), gmin_pad, gmax_pad, 1e-4,
    )
    ent = np.asarray(
        jnp.where(tn0 <= tf0, tn0, jnp.inf)
    ).reshape(n, g_padded)[:, :g]

    # entry-sorted group list per ray
    order = np.argsort(ent, axis=1, kind="stable")
    ent_s = np.take_along_axis(ent, order, axis=1)

    # ideal front-to-back visits: count entries <= running best; best drops
    # to t_fin at the slot holding hit_grp
    visits = np.zeros(n, np.int32)
    t_run = tmax.copy()
    hit_slot = np.full(n, 1 << 30, np.int64)
    hg = hit_grp[:, None]
    match = (order == hg) & np.isfinite(ent_s)
    any_m = match.any(axis=1)
    hit_slot[any_m] = match.argmax(axis=1)[any_m]
    slots = np.arange(g)[None, :]
    best = np.where(slots >= hit_slot[:, None] + 1, t_fin[:, None], tmax[:, None])
    # visit slot j iff ent_s[:, j] <= best BEFORE processing slot j:
    # best before slot j = tmax if j <= hit_slot else t_fin
    best_before = np.where(slots <= hit_slot[:, None], tmax[:, None], t_fin[:, None])
    visit = np.isfinite(ent_s) & (ent_s <= best_before)
    visits = visit.sum(axis=1)

    qs = np.percentile(visits, [50, 75, 90, 95, 99, 100])
    print(f"--- {name}: n={n} rays, hit {hitm.mean()*100:.0f}% ---")
    print(f"  ideal F2B group visits/ray: mean {visits.mean():.2f}  "
          f"p50/p75/p90/p95/p99/max = {[int(q) for q in qs]}")
    tot = visits.sum()
    for r in (1, 2, 3, 4, 6, 8, 12):
        cov = np.minimum(visits, r).sum() / tot
        surv = (visits > r).mean()
        print(f"  R={r:2d}: covers {cov*100:5.1f}% of visits, "
              f"survivors {surv*100:5.2f}% of rays")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
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
    o = np.asarray(o)[: size * size]
    d = np.asarray(d)[: size * size]
    stats("primary", o, d, cl)

    h = intersect_clusters(jnp.asarray(o), jnp.asarray(d), cl, use_pallas=False)
    t = np.asarray(h.t)
    hitm = t >= 0
    p = o[hitm] + d[hitm] * t[hitm][:, None] * 0.999
    rng = np.random.default_rng(3)
    nd = rng.normal(size=p.shape).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    keep = (len(p) // 128) * 128
    stats("bounce", p[:keep].astype(np.float32), nd[:keep].astype(np.float32), cl)


if __name__ == "__main__":
    main()
