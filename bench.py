"""Benchmark: path segments/sec on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 200M path segments/sec/chip (BASELINE.json north star).

Scene: colonnade (~334k triangles — BASELINE.json defines the target on a
~300K-tri Sponza-class scene; the reference's own Sponza asset is not
bundled, so this is the equivalent-scale stand-in: instanced fluted
columns, drapes, statues, emissive lamps, sun-hotspot sky).

This file is the ONLY perf oracle (VERDICT r4): PERF.md numbers must
reproduce under `python bench.py` cold, and the run refuses to start if
any VPT_* tuning/ablation env var is set (vpt_tpu.envguard).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 200e6
# Nominal TPU v5e (lite) TensorCore clock — used only to express the wall
# rate in hardware terms (cycles of ONE chip per path segment, including
# the XLA envelope and relay floor, not kernel-only time).
TPU_V5E_CLOCK_HZ = 940e6


def derived_hardware_detail(median_rate, median_dt, segs_per_dispatch, spp_per_dispatch):
    """Pure derivation of the hardware-terms bench fields (unit-tested:
    tests/test_api.py::test_bench_derived_detail_finite).

    - time_to_1024spp_s: dispatches needed x measured dispatch wall
      (VERDICT r4 #5; reference ETA analogue Editor.cpp:410-427).
    - cycles_per_segment: wall chip cycles per path segment.
    - mt_utilization_pct: fraction of VPU peak spent on USEFUL
      Moller-Trumbore tests (~290/segment at ~40 flops on the colonnade
      cost model) — the automated fill figure (VERDICT r4 #6).
    """
    time_to_1024spp = -(-1024 // spp_per_dispatch) * median_dt
    cycles_per_segment = median_dt * TPU_V5E_CLOCK_HZ / max(segs_per_dispatch, 1.0)
    mt_utilization_pct = median_rate * 290.0 * 40.0 / 4e12 * 100.0
    return {
        "time_to_1024spp_s": round(time_to_1024spp, 1),
        "cycles_per_segment": round(cycles_per_segment, 1),
        "mt_utilization_pct": round(mt_utilization_pct, 4),
    }


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.envguard import require_clean_env

    require_clean_env()

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
    # is DISCARDED and re-run (up to a retry budget), and the artifact
    # reports how many were discarded (`detail.discarded`) plus aggregates
    # recomputed from the KEPT set only (ADVICE r4).
    n_target = 8
    max_total = 24
    kept = []  # (rate, segments, dt) per kept dispatch
    discarded = 0
    i = 0
    while len(kept) < n_target and i < max_total:
        t0 = time.perf_counter()
        out, segs = _render_step(
            data, meta, flags, params, jnp.uint32(2 + i), (width, height), out,
            jnp.int32(1 + i), spp_per_dispatch,
        )
        out.block_until_ready()
        dt = time.perf_counter() - t0
        i += 1
        rate = float(segs) / dt
        if len(kept) >= 3:
            med = float(np.median([k[0] for k in kept]))
            if rate > 3.0 * med or rate < med / 3.0:
                discarded += 1
                print(
                    f"discarding outlier dispatch: {rate/1e6:.2f} M segs/s "
                    f"(running median {med/1e6:.2f} M)", flush=True,
                )
                continue
        kept.append((rate, float(segs), dt))
        # Retrospective prune: an artifact in the FIRST <3 dispatches (before
        # the prospective screen arms) must not survive into the committed
        # artifact (VERDICT r3/r4: 1.15G and 5.1G "dispatches" did).  The
        # median is always a member of the kept set, so pruning against it
        # keeps the honest majority and re-runs the slots it frees.
        if len(kept) >= 4:
            med = float(np.median([k[0] for k in kept]))
            pruned = [k for k in kept if med / 3.0 <= k[0] <= 3.0 * med]
            if len(pruned) != len(kept):
                discarded += len(kept) - len(pruned)
                print(
                    f"retro-discarding {len(kept) - len(pruned)} early outlier(s) "
                    f"(median {med/1e6:.2f} M)", flush=True,
                )
                kept = pruned

    rates = [k[0] for k in kept]
    total_segments = sum(k[1] for k in kept)
    elapsed = sum(k[2] for k in kept)
    value = float(np.median(rates))
    median_dt = float(np.median([k[2] for k in kept]))
    segs_per_dispatch = float(np.median([k[1] for k in kept]))
    spread = max(rates) / max(min(rates), 1e-9)
    if spread > 3.0:
        # Still possible if the first 3 (pre-screen) dispatches disagreed.
        print(f"WARNING: dispatch rate spread {spread:.1f}x > 3x — noisy run", flush=True)

    hw = derived_hardware_detail(value, median_dt, segs_per_dispatch, spp_per_dispatch)

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
                    "dispatches": len(kept),
                    "discarded": discarded,
                    "elapsed_s": round(elapsed, 3),
                    "total_segments": total_segments,
                    "median_dispatch_s": round(median_dt, 4),
                    **hw,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
