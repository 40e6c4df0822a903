"""Device parity + timing: rounds traversal vs stream kernel.

Usage: python scripts/rounds_check.py [scene] [n_rays] [r_cap...]
Compares closest-hit results on random rays, then times both; sweeps the
listed r_cap values (default 0 2 3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.accel.rounds import intersect_rounds
    from vpt_tpu.accel.stream import intersect_stream
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene import procedural

    name = sys.argv[1] if len(sys.argv) > 1 else "colonnade"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    caps = [int(a) for a in sys.argv[3:]] or [2]

    scene = getattr(procedural, name)()
    data, meta, aux = compile_scene(scene)
    cl = data.clusters
    print(f"{name}: {meta.n_tris} tris, {cl.n_clusters} clusters", flush=True)

    @jax.jit
    def run_stream(o, d, act, tmax, ah, cl):
        return intersect_stream(o, d, cl, t_max=tmax, active=act, anyhit=ah)

    import functools

    @functools.partial(jax.jit, static_argnames=("r_cap",))
    def run_rounds(o, d, act, tmax, ah, cl, r_cap=2):
        return intersect_rounds(
            o, d, cl, t_max=tmax, active=act, anyhit=ah, r_cap=r_cap
        )

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
    ah = jnp.asarray(rng.random(n) > 0.5)  # half anyhit: merged-trace shape
    no_ah = jnp.zeros(n, bool)
    tmax_hi = jnp.full(n, 1e8, jnp.float32)

    t0 = time.time()
    h_ref = run_stream(o, d, act, tmax_hi, no_ah, cl)
    jax.block_until_ready(h_ref)
    print(f"stream compile+run: {time.time()-t0:.1f}s", flush=True)
    t_ref = np.asarray(h_ref.t)
    tri_ref = np.asarray(h_ref.tri)

    for cap in caps:
        t0 = time.time()
        h_new = run_rounds(o, d, act, tmax_hi, no_ah, cl, r_cap=cap)
        jax.block_until_ready(h_new)
        print(f"rounds(r_cap={cap}) compile+run: {time.time()-t0:.1f}s", flush=True)
        t_new = np.asarray(h_new.t)
        tri_new = np.asarray(h_new.tri)
        hit_mismatch = (t_ref >= 0) != (t_new >= 0)
        both = (t_ref >= 0) & (t_new >= 0)
        dt = np.abs(t_ref[both] - t_new[both])
        tri_diff = (tri_new != tri_ref) & both
        print(
            f"  r_cap={cap}: hit/miss mismatch {hit_mismatch.sum()}/{n}, "
            f"t maxdiff {dt.max() if both.any() else 0:.2e}, "
            f"tri mismatch beyond ties "
            f"{(tri_diff & (np.abs(t_ref - t_new) > 1e-4)).sum()}",
            flush=True,
        )

    # anyhit-mixed wavefront parity (blocked iff closest finds a hit)
    tmax = jnp.asarray(rng.uniform(0.5, 3.0, n).astype(np.float32) * float(ext.max()))
    h_cls = run_stream(o, d, act, tmax, no_ah, cl)
    h_mix = run_rounds(o, d, act, tmax, ah, cl, r_cap=caps[-1])
    blocked_ref = np.asarray(h_cls.t) >= 0
    blocked_new = np.asarray(h_mix.t) >= 0
    m = np.asarray(ah) & np.asarray(act)
    print(f"anyhit blocked mismatches: {(blocked_new != blocked_ref)[m].sum()} / {m.sum()}",
          flush=True)

    # timing (vary inputs to defeat the relay cache)
    timers = [("stream", lambda o2: run_stream(o2, d, act, tmax_hi, no_ah, cl))]
    for cap in caps:
        timers.append(
            (f"rounds{cap}", lambda o2, cap=cap: run_rounds(o2, d, act, tmax_hi, no_ah, cl, r_cap=cap))
        )
    for label, fn in timers:
        ts = []
        for i in range(6):
            o2 = o + jnp.float32(i * 1e-4)
            t0 = time.time()
            h = fn(o2)
            jax.block_until_ready(h)
            ts.append(time.time() - t0)
        print(f"{label}: median {np.median(ts)*1e3:.1f} ms "
              f"({[f'{t*1e3:.0f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
