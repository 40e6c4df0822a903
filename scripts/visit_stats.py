"""Measure cull/visit statistics for a realistic wavefront on sphere_garden.

Reports per-packet candidate counts and sub-block occupancy so kernel
changes can be sized against the real distribution rather than guesses.
Runs on CPU (same math as device).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from vpt_tpu.accel.cluster import PACKET_SIZE, _slab_tn_tf
from vpt_tpu.core.camera import perspective
from vpt_tpu.core.tiling import tiled_pixel_order
from vpt_tpu.render.params import default_params
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene import procedural


def stats(name, origin, direction, cl, sort_rays):
    n = origin.shape[0]
    packet = PACKET_SIZE
    n_pk = n // packet
    c = cl.n_clusters
    c_padded = -(-c // 128) * 128
    cmin_pad = jnp.concatenate([cl.aabb_min, jnp.full((c_padded - c, 3), 3e9, jnp.float32)]).T
    cmax_pad = jnp.concatenate([cl.aabb_max, jnp.full((c_padded - c, 3), 3e9, jnp.float32)]).T
    tmax = jnp.full(n, 1e8, jnp.float32)

    if sort_rays:
        tn0, tf0 = _slab_tn_tf(
            origin.reshape(n_pk, packet, 3), direction.reshape(n_pk, packet, 3),
            tmax.reshape(n_pk, packet), cmin_pad, cmax_pad, 1e-4,
        )
        ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, c_padded)
        first = jnp.argmin(ent, axis=1).astype(jnp.int32)
        v1 = jnp.min(ent, axis=1)
        ids_row = jnp.arange(c_padded, dtype=jnp.int32)[None, :]
        ent2 = jnp.where(ids_row == first[:, None], jnp.inf, ent)
        second = jnp.argmin(ent2, axis=1).astype(jnp.int32)
        v2 = jnp.min(ent2, axis=1)
        sentinel = jnp.int32(c_padded)
        first = jnp.where(jnp.isfinite(v1), first, sentinel)
        second = jnp.where(jnp.isfinite(v2), second, sentinel)
        key = first * (c_padded + 1) + second
        order = jnp.argsort(key)
        origin = origin[order]
        direction = direction[order]

    tn, tf = _slab_tn_tf(
        origin.reshape(n_pk, packet, 3), direction.reshape(n_pk, packet, 3),
        tmax.reshape(n_pk, packet), cmin_pad, cmax_pad, 1e-4,
    )
    enter = np.asarray((tn <= tf))  # (P, pk, Cp)
    per_ray = enter.sum(axis=2)  # clusters entered per ray
    per_packet = enter.any(axis=1).sum(axis=1)  # candidates per packet

    # Group-level candidates (what the kernel actually marches now).
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate([cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    gmax_pad = jnp.concatenate([cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]).T
    gtn, gtf = _slab_tn_tf(
        origin.reshape(n_pk, packet, 3), direction.reshape(n_pk, packet, 3),
        tmax.reshape(n_pk, packet), gmin_pad, gmax_pad, 1e-4,
    )
    g_enter = np.asarray(gtn <= gtf)
    g_per_packet = g_enter.any(axis=1).sum(axis=1)

    # Sub-block occupancy: for each (packet, candidate) pair, how many of the
    # 8 sub-AABBs does at least one entering ray hit?
    nrows = cl.tris_rk.shape[1]
    sab = np.asarray(cl.tris_rk)[:, nrows - 8 :, :6]  # (c, 8, 6)
    o = np.asarray(origin).reshape(n_pk, packet, 3)
    d = np.asarray(direction).reshape(n_pk, packet, 3)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    rng = np.random.default_rng(0)
    sample_pk = rng.choice(n_pk, size=min(64, n_pk), replace=False)
    subs_run = []
    mt_flops = 0
    for p in sample_pk:
        cand = np.nonzero(enter[p].any(axis=0))[0]
        cand = cand[cand < c]
        for ci in cand:
            lo, hi = sab[ci, :, :3], sab[ci, :, 3:]  # (8, 3)
            t0 = (lo[None, :, :] - o[p][:, None, :]) * inv[p][:, None, :]
            t1 = (hi[None, :, :] - o[p][:, None, :]) * inv[p][:, None, :]
            tn_ = np.maximum(np.minimum(t0, t1).max(axis=2), 1e-4)
            tf_ = np.maximum(t0, t1).min(axis=2)
            hit_sub = (tn_ <= tf_).any(axis=0)  # (8,)
            subs_run.append(hit_sub.sum())
            mt_flops += hit_sub.sum() * 128 * 128 * 40
    subs_run = np.array(subs_run)

    print(f"--- {name} (sort_rays={sort_rays}) ---")
    print(f"  clusters C={c}, packets={n_pk}")
    print(f"  clusters entered per ray:    mean {per_ray.mean():.2f}  p50 {np.percentile(per_ray,50):.0f}  p95 {np.percentile(per_ray,95):.0f}")
    print(f"  candidates per packet:       mean {per_packet.mean():.2f}  p50 {np.percentile(per_packet,50):.0f}  p95 {np.percentile(per_packet,95):.0f}  max {per_packet.max()}")
    print(f"  SIMD waste (pkt/ray ratio):  {per_packet.mean()/max(per_ray.mean(),1e-9):.2f}x")
    print(f"  group candidates per packet: mean {g_per_packet.mean():.2f}  p95 {np.percentile(g_per_packet,95):.0f}  (G={g})")
    if len(subs_run):
        print(f"  sub-blocks run per visit:    mean {subs_run.mean():.2f} / 8   (MT flops/visit {subs_run.mean()*128*128*40/1e6:.2f} MF)")
        per_visit_us = subs_run.mean() * 128 * 128 * 40 / 4e12 * 1e6
        print(f"  MT-only time/visit at 4TF/s: {per_visit_us:.2f} us")


def main():
    import sys as _sys
    name = _sys.argv[1] if len(_sys.argv) > 1 else "sphere_garden"
    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    view = aux["camera_view"]
    size = 256
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))

    pxy, pidx, sct, padded = tiled_pixel_order(size, size)
    from vpt_tpu.core import rng as rngmod
    from vpt_tpu.core.camera import generate_primary_rays

    st = rngmod.seed(jnp.asarray(pidx), jnp.uint32(0), jnp.uint32(1))
    st, org, d = generate_primary_rays(
        params.view_inverse, params.proj_inverse, jnp.asarray(pxy), (size, size), st,
        params.focus_distance, params.dof_strength,
    )
    stats("primary", org, d, cl, sort_rays=False)
    stats("primary", org, d, cl, sort_rays=True)

    # Synthetic diffuse bounce: origins on random surface points, random
    # up-hemisphere directions (stands in for a traced first bounce).
    rng = np.random.default_rng(1)
    n = org.shape[0]
    p0 = np.asarray(data.tri_p0)[: meta.n_tris]
    e1 = np.asarray(data.tri_e1)[: meta.n_tris]
    e2 = np.asarray(data.tri_e2)[: meta.n_tris]
    ti = rng.integers(0, meta.n_tris, n)
    b1 = rng.uniform(0, 1, n)
    b2 = rng.uniform(0, 1, n) * (1 - b1)
    pos = p0[ti] + b1[:, None] * e1[ti] + b2[:, None] * e2[ti]
    nd = rng.normal(size=pos.shape)
    nd /= np.linalg.norm(nd, axis=-1, keepdims=True)
    nd[:, 1] = np.abs(nd[:, 1])
    org2 = jnp.asarray(pos + 1e-3 * nd, jnp.float32)
    d2 = jnp.asarray(nd, jnp.float32)
    stats("bounce-1 diffuse", org2, d2, cl, sort_rays=False)
    stats("bounce-1 diffuse", org2, d2, cl, sort_rays=True)


if __name__ == "__main__":
    main()
