"""Time the stream-trace XLA envelope stage by stage, on chip.

Each stage runs K iterations inside one jit'd fori_loop with a varying
perturbation (defeats the relay execution cache and amortizes the ~30 ms
relay floor); reported ms is per iteration.

Stages:
  slab1    — (N,Gp) slab pass + 2-level key extraction
  sort10   — production 10-payload lax.sort
  sort2    — (key, lane) lax.sort + 8 gathers
  slab2    — post-sort (N,Gp) slab pass + supertile tables
  unsortS  — production unsort via 5-payload lax.sort
  unsortG  — unsort via inverse-perm gathers

Usage: python scripts/envelope_probe.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.accel.cluster import _slab_tn_tf
    from vpt_tpu.accel.cluster import PACKET_SIZE
    from vpt_tpu.accel.stream import SUPER_ROWS, TILES_PER_BAND
    from vpt_tpu.core.camera import generate_primary_rays, perspective
    from vpt_tpu.core import rng
    from vpt_tpu.render.params import default_params
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene.procedural import colonnade

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = size * size
    K = 8
    scene = colonnade()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    view = aux["camera_view"]
    proj = perspective(np.radians(aux["camera_fov_deg"]), 1.0)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))

    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    pixel_xy = jnp.asarray(
        np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
    )
    pix = jnp.asarray((xs.reshape(-1) + size * ys.reshape(-1)).astype(np.uint32))
    state = rng.seed(pix, jnp.uint32(0), jnp.uint32(1))
    _, origin, direction = generate_primary_rays(
        params.view_inverse, params.proj_inverse, pixel_xy, (size, size), state,
        params.focus_distance, params.dof_strength,
    )
    origin = jax.block_until_ready(origin)
    tmax = jnp.full(n, 1e8, jnp.float32)

    g = cl.group_min.shape[0]
    g_padded = -(-g // 128) * 128
    gmin_pad = jnp.concatenate(
        [cl.group_min, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    gmax_pad = jnp.concatenate(
        [cl.group_max, jnp.full((g_padded - g, 3), 3e9, jnp.float32)]
    ).T
    gp1 = g_padded + 1
    n_pk = n // PACKET_SIZE

    def keys_of(o, d, tm):
        tn0, tf0 = _slab_tn_tf(
            o.reshape(n_pk, PACKET_SIZE, 3),
            d.reshape(n_pk, PACKET_SIZE, 3),
            tm.reshape(n_pk, PACKET_SIZE), gmin_pad, gmax_pad, 1e-4,
        )
        ent = jnp.where(tn0 <= tf0, tn0, jnp.inf).reshape(n, g_padded)
        sentinel = jnp.int32(g_padded)
        ids_row = jnp.arange(g_padded, dtype=jnp.int32)[None, :]
        g0 = jnp.argmin(ent, axis=1).astype(jnp.int32)
        v0 = jnp.min(ent, axis=1)
        lvl0 = jnp.where(jnp.isfinite(v0), g0, sentinel)
        rem = jnp.where(ids_row == g0[:, None], jnp.inf, ent)
        g1 = jnp.argmin(rem, axis=1).astype(jnp.int32)
        v1 = jnp.min(rem, axis=1)
        lvl1 = jnp.where(jnp.isfinite(v1), g1, sentinel)
        return lvl0 * gp1 + lvl1

    key0 = jax.block_until_ready(keys_of(origin, direction, tmax))
    lane = jax.lax.iota(jnp.int32, n)
    flags = jnp.ones(n, jnp.int32)

    def loop(stage):
        def f(i, carry):
            acc, o = carry
            o = o + 1e-6
            acc = acc + stage(o)
            return acc, o

        def run(o0):
            acc, _ = jax.lax.fori_loop(0, K, f, (jnp.float32(0), o0))
            return acc

        return jax.jit(run)

    def timed(name, fn, arg):
        jax.block_until_ready(fn(arg))
        ts = []
        for i in range(1, 4):
            a = arg + 1e-5 * i
            t0 = time.perf_counter()
            jax.block_until_ready(fn(a))
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s} {np.median(ts) / K * 1e3:8.2f} ms/iter", flush=True)

    # slab1: key computation
    timed("slab1", loop(lambda o: keys_of(o, direction, tmax).sum().astype(jnp.float32)), origin)

    # sort10
    def s10(o):
        outs = jax.lax.sort(
            (key0 + o[0, 0].astype(jnp.int32), lane, o[:, 0], o[:, 1], o[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2], tmax, flags),
            num_keys=1, is_stable=True,
        )
        return sum(x.sum().astype(jnp.float32) for x in outs[2:5])

    timed("sort10", loop(s10), origin)

    # sort2 + gathers
    def s2(o):
        _, perm = jax.lax.sort(
            (key0 + o[0, 0].astype(jnp.int32), lane), num_keys=1, is_stable=True
        )
        outs = [a[perm] for a in (o[:, 0], o[:, 1], o[:, 2], direction[:, 0],
                                  direction[:, 1], direction[:, 2], tmax,
                                  flags.astype(jnp.float32))]
        return sum(x.sum() for x in outs[:3])

    timed("sort2", loop(s2), origin)

    # slab2: post-sort supertile tables (use unsorted rays; same cost)
    n_st = n // (SUPER_ROWS * 128)
    tiles_pb = TILES_PER_BAND
    band = tiles_pb * SUPER_ROWS * 128
    b = max(n // band, 1)

    def tables(o):
        o_s = jnp.stack([o[:, 0], o[:, 1], o[:, 2]], -1).reshape(
            n_st, SUPER_ROWS * 128, 3
        )
        d_s = direction.reshape(n_st, SUPER_ROWS * 128, 3)
        tm = tmax.reshape(n_st, SUPER_ROWS * 128)
        tns, tfs = _slab_tn_tf(o_s, d_s, tm, gmin_pad, gmax_pad, 1e-4)
        enter_st = tns <= tfs
        st_entry = jnp.min(jnp.where(enter_st, tns, jnp.inf), axis=1)
        shifts = jnp.arange(tiles_pb, dtype=jnp.uint32)
        bits = jnp.sum(
            jnp.any(enter_st, 1).reshape(b, tiles_pb, g_padded).astype(jnp.uint32)
            << shifts[None, :, None], axis=1, dtype=jnp.uint32)
        entry_bg = jnp.min(st_entry.reshape(b, tiles_pb, g_padded), axis=1)
        gids = jnp.broadcast_to(
            jnp.arange(g_padded, dtype=jnp.int32)[None, :], (b, g_padded))
        entry_sorted, order = jax.lax.sort((entry_bg, gids), dimension=1, num_keys=1)
        return (bits.sum().astype(jnp.float32) + entry_sorted[0].sum()
                + order.sum().astype(jnp.float32) + st_entry[0].sum())

    timed("slab2", loop(tables), origin)

    # unsort via sort
    def us(o):
        outs = jax.lax.sort(
            (lane + o[0, 0].astype(jnp.int32) * 0, o[:, 0] * 2.0, key0, o[:, 1], o[:, 2]),
            num_keys=1, is_stable=True,
        )
        return outs[1].sum() + outs[3].sum()

    timed("unsortS", loop(us), origin)

    # unsort via gathers (inverse perm precomputed once per trace: scatter)
    def ug(o):
        inv = jnp.zeros(n, jnp.int32).at[lane].set(lane)  # stand-in scatter
        outs = [a[inv] for a in (o[:, 0] * 2.0, key0.astype(jnp.float32), o[:, 1], o[:, 2])]
        return outs[0].sum() + outs[2].sum()

    timed("unsortG", loop(ug), origin)


if __name__ == "__main__":
    main()
