"""Stage timing for the rounds traversal: where does a round's time go?

Builds colonnade, then times nested prefixes of one round's pipeline
(ent pass -> next-candidate -> 9-op ray sort -> run tables -> kernel ->
unsort) as separate jit functions; successive differences = stage cost.
Also times full intersect_rounds with/without the stream fallback
(VPT_ROUNDS_FALLBACK handled by re-exec env).

Usage: python scripts/rounds_stats.py [scene] [n_rays]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from vpt_tpu.accel.cluster import _slab_tn_tf
    from vpt_tpu.accel.rounds import rounds_pallas, _SENT
    from vpt_tpu.accel.stream import SUPER_ROWS, TILES_PER_BAND
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene import procedural

    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters

    band = TILES_PER_BAND * SUPER_ROWS * 128
    assert n % band == 0
    b = n // band
    tiles_pb = TILES_PER_BAND
    pk = SUPER_ROWS * 128
    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    print(f"{name}: {meta.n_tris} tris, {cl.n_clusters} clusters, G={g} Gp={g_padded}",
          flush=True)

    rng = np.random.default_rng(7)
    lo = np.asarray(jnp.min(cl.group_min, axis=0))
    hi = np.asarray(jnp.max(cl.group_max, axis=0))
    center, ext = (lo + hi) / 2, (hi - lo)
    o_np = center + (rng.uniform(-0.6, 0.6, (n, 3)) * ext).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    t_min = 1e-4

    def prefix(stage):
        @jax.jit
        def run(origin, direction, cl):
            tmax_arr = jnp.full(n, 1e8, jnp.float32)
            gmin_pad = jnp.concatenate(
                [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
            ).T
            gmax_pad = jnp.concatenate(
                [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
            ).T
            tn0, tf0 = _slab_tn_tf(
                origin.reshape(n // pk, pk, 3),
                direction.reshape(n // pk, pk, 3),
                tmax_arr.reshape(n // pk, pk), gmin_pad, gmax_pad, t_min,
            )
            ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)
            if stage == "ent":
                return jnp.sum(jnp.where(jnp.isfinite(ent), ent, 0.0))
            gid_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
            ek = jnp.min(ent, axis=1)
            gk = jnp.min(
                jnp.where(ent == ek[:, None], gid_row, g_padded), axis=1
            ).astype(jnp.int32)
            key = jnp.where(jnp.isfinite(ek), gk, _SENT)
            if stage == "cand":
                return jnp.sum(key)
            lane_ids = jax.lax.iota(jnp.int32, n)
            bt = tmax_arr
            (key_s, lane_s, ox, oy, oz, dxs, dys, dzs, bt_s) = jax.lax.sort(
                (key, lane_ids, origin[:, 0], origin[:, 1], origin[:, 2],
                 direction[:, 0], direction[:, 1], direction[:, 2], bt),
                num_keys=1, is_stable=True,
            )
            if stage == "sort":
                return jnp.sum(ox) + jnp.sum(key_s)
            si_band = (jnp.arange(band, dtype=jnp.int32) // pk)[None, :]
            BIG_I = jnp.int32(1 << 30)
            ks_b = key_s.reshape(b, band)
            eq = ks_b[:, :, None] == gid_row[None, :, :]
            cntg = jnp.sum(eq, axis=1)
            smin = jnp.min(jnp.where(eq, si_band[:, :, None], BIG_I), axis=1)
            smax = jnp.max(jnp.where(eq, si_band[:, :, None], -1), axis=1)
            present = cntg > 0
            runkey = jnp.where(
                present, jnp.broadcast_to(gid_row, (b, g_padded)), BIG_I
            )
            rung, t0s, t1s = jax.lax.sort(
                (runkey, smin.astype(jnp.int32), smax.astype(jnp.int32)),
                dimension=1, num_keys=1,
            )
            nrun = jnp.sum(present, axis=1).astype(jnp.int32)
            if stage == "tables":
                return jnp.sum(rung) + jnp.sum(nrun) + jnp.sum(t0s) + jnp.sum(t1s)
            shape4 = (b, tiles_pb, SUPER_ROWS, 128)
            kt, ktri, ku, kv = rounds_pallas(
                nrun, rung, t0s, t1s,
                ox.reshape(shape4), oy.reshape(shape4), oz.reshape(shape4),
                dxs.reshape(shape4), dys.reshape(shape4), dzs.reshape(shape4),
                bt_s.reshape(shape4), key_s.reshape(shape4),
                cl.aabbs, cl.count, cl.start, cl.block_id, cl.inst, cl.inv_rows,
                cl.tris_rk, t_min=t_min,
            )
            if stage == "kernel":
                return jnp.sum(kt) + jnp.sum(ktri)
            (_, t_u, tri_u, u_u, v_u) = jax.lax.sort(
                (lane_s, kt.reshape(n), ktri.reshape(n), ku.reshape(n),
                 kv.reshape(n)),
                num_keys=1, is_stable=True,
            )
            return jnp.sum(t_u) + jnp.sum(tri_u)

        return run

    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    prev = 0.0
    for stage in ("ent", "cand", "sort", "tables", "kernel", "unsort"):
        fn = prefix(stage)
        r = fn(o, d, cl)
        jax.block_until_ready(r)
        ts = []
        for i in range(6):
            o2 = o + jnp.float32(i * 1e-4)
            t0 = time.time()
            r = fn(o2, d, cl)
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{stage:7s}: {med:7.1f} ms  (+{med - prev:6.1f})", flush=True)
        prev = med


if __name__ == "__main__":
    main()
