"""Device parity + timing check: conveyor kernel vs stream kernel.

Usage: python scripts/conveyor_check.py [scene] [n_rays]
Compares closest-hit results on random rays, then times both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.accel.conveyor import intersect_conveyor
    from vpt_tpu.accel.stream import intersect_stream
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene import procedural

    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    print(f"{name}: {meta.n_tris} tris, {cl.n_clusters} clusters", flush=True)

    @jax.jit
    def run_stream(o, d, act, tmax, ah, cl):
        return intersect_stream(o, d, cl, t_max=tmax, active=act, anyhit=ah)

    @jax.jit
    def run_conv(o, d, act, tmax, ah, cl):
        return intersect_conveyor(o, d, cl, t_max=tmax, active=act, anyhit=ah)

    rng = np.random.default_rng(7)
    lo = np.asarray(jnp.min(cl.group_min, axis=0))
    hi = np.asarray(jnp.max(cl.group_max, axis=0))
    center, ext = (lo + hi) / 2, (hi - lo)
    o = center + (rng.uniform(-0.6, 0.6, (n, 3)) * ext).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    act = jnp.asarray(rng.random(n) > 0.1)

    tmax_hi = jnp.full(n, 1e8, jnp.float32)
    no_ah = jnp.zeros(n, bool)
    t0 = time.time()
    h_ref = run_stream(o, d, act, tmax_hi, no_ah, cl)
    jax.block_until_ready(h_ref)
    print(f"stream compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    h_new = run_conv(o, d, act, tmax_hi, no_ah, cl)
    jax.block_until_ready(h_new)
    print(f"conveyor compile+run: {time.time()-t0:.1f}s", flush=True)

    t_ref = np.asarray(h_ref.t)
    t_new = np.asarray(h_new.t)
    tri_ref = np.asarray(h_ref.tri)
    tri_new = np.asarray(h_new.tri)
    hit_mismatch = (t_ref >= 0) != (t_new >= 0)
    print(f"hit/miss mismatches: {hit_mismatch.sum()} / {n}")
    both = (t_ref >= 0) & (t_new >= 0)
    dt = np.abs(t_ref[both] - t_new[both])
    print(f"t max abs diff (both hit): {dt.max() if both.any() else 0:.2e}")
    tri_diff = (tri_ref != tri_new) & both
    print(f"tri mismatches: {tri_diff.sum()}  (with t diff > 1e-4: "
          f"{(tri_diff & (np.abs(t_ref - t_new) > 1e-4)).sum()})")

    # anyhit blocked parity
    tmax = jnp.asarray(
        rng.uniform(0.5, 3.0, n).astype(np.float32) * float(ext.max())
    )
    h_any = run_conv(o, d, act, tmax, jnp.ones(n, bool), cl)
    h_cls = run_stream(o, d, act, tmax, no_ah, cl)
    blocked_new = np.asarray(h_any.t) >= 0
    blocked_ref = np.asarray(h_cls.t) >= 0
    print(f"anyhit blocked mismatches: {(blocked_new != blocked_ref).sum()} "
          f"/ {n}", flush=True)

    # timing (vary inputs to defeat the relay cache)
    for fn, label in (
        (lambda o2: run_conv(o2, d, act, tmax_hi, no_ah, cl), "conveyor"),
        (lambda o2: run_stream(o2, d, act, tmax_hi, no_ah, cl), "stream"),
    ):
        ts = []
        for i in range(6):
            o2 = o + jnp.float32(i * 1e-4)
            t0 = time.time()
            h = fn(o2)
            jax.block_until_ready(h)
            ts.append(time.time() - t0)
        print(f"{label}: median {np.median(ts)*1e3:.1f} ms over {len(ts)} "
              f"({[f'{t*1e3:.0f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
