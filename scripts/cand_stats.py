"""Per-ray candidate-group statistics for sizing the dense traversal.

Reports, for primary and synthetic-bounce wavefronts on a scene: the
distribution of entered GROUPS per ray, the rank split (how many
incidences are each ray's 1st/2nd vs 3rd+ candidate), and what fraction
of rays a fixed-K candidate list would cover exactly.

Usage: python scripts/cand_stats.py [scene] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vpt_tpu.accel.cluster import _slab_tn_tf
from vpt_tpu.core.camera import perspective
from vpt_tpu.core.tiling import tiled_pixel_order
from vpt_tpu.render.params import default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def stats(name, origin, direction, cl, tmax_val=1e8):
    n = origin.shape[0]
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate([cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    gmax_pad = jnp.concatenate([cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    tmax = np.full(n, tmax_val, np.float32)

    tn, tf = _slab_tn_tf(
        jnp.asarray(origin).reshape(-1, 128, 3),
        jnp.asarray(direction).reshape(-1, 128, 3),
        jnp.asarray(tmax).reshape(-1, 128), gmin_pad, gmax_pad, 1e-4,
    )
    ent = np.asarray(jnp.where(tn <= tf, tn, jnp.inf)).reshape(n, g_padded)[:, :g]
    counts = np.isfinite(ent).sum(axis=1)  # groups entered per ray
    hist = np.bincount(counts, minlength=17)
    total_inc = counts.sum()
    tail_inc = np.maximum(counts - 2, 0).sum()

    # member (cluster) incidence for entered groups: slab member boxes
    # for a random subsample to keep CPU cost down
    samp = np.random.default_rng(0).choice(n, size=min(n, 8192), replace=False)
    cmin = np.asarray(cl.aabb_min)
    cmax = np.asarray(cl.aabb_max)
    cnt = np.asarray(cl.count)
    c = cnt.shape[0]
    o_s = origin[samp]
    d_s = direction[samp]
    inv = 1.0 / np.where(np.abs(d_s) > 1e-20, d_s, 1e-20)
    t0 = (cmin[None] - o_s[:, None]) * inv[:, None]
    t1 = (cmax[None] - o_s[:, None]) * inv[:, None]
    tn_c = np.maximum(np.minimum(t0, t1).max(axis=2), 1e-4)
    tf_c = np.minimum(np.maximum(t0, t1).min(axis=2), tmax_val)
    ent_c = (tn_c <= tf_c) & (cnt[None, :] > 0)
    ccounts = ent_c.sum(axis=1)

    print(f"--- {name}: n={n} rays, G={g}, C={c} ---")
    print(f"  groups/ray:  mean {counts.mean():.2f}  p50 {np.percentile(counts,50):.0f} "
          f"p90 {np.percentile(counts,90):.0f}  p99 {np.percentile(counts,99):.0f}  "
          f"p99.9 {np.percentile(counts,99.9):.0f}  max {counts.max()}")
    print(f"  clusters/ray (8K sample): mean {ccounts.mean():.2f}  p99 "
          f"{np.percentile(ccounts,99):.0f}  max {ccounts.max()}")
    print(f"  incidences: total {total_inc}  rank1-2 {total_inc-tail_inc} "
          f"({100*(total_inc-tail_inc)/max(total_inc,1):.0f}%)  rank3+ {tail_inc}")
    for k in (2, 4, 6, 8, 10, 12):
        print(f"  P(groups > {k}) = {(counts > k).mean()*100:.3f}%"
              f"   rays = {(counts > k).sum()}")
    return counts


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
    o = np.asarray(o)[: size * size]
    d = np.asarray(d)[: size * size]
    stats("primary", o, d, cl)

    # synthetic bounce: origins on geometry (march primaries to a plausible
    # hit via the group entry), directions cosine-ish random
    rng = np.random.default_rng(1)
    t_hit = np.full(o.shape[0], 5.0, np.float32)
    o2 = o + d * t_hit[:, None] * rng.uniform(0.2, 1.0, o.shape[0]).astype(np.float32)[:, None]
    d2 = rng.normal(size=o.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    stats("bounce-like", o2, d2, cl)


if __name__ == "__main__":
    main()
