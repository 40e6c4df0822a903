"""Guard against ablation/tuning env vars poisoning golden or bench runs.

The trace path exposes env knobs for profiling probes (VPT_STREAM_ABLATE
skips kernel stages and silently corrupts renders; VPT_TRACE/VPT_SORT_RAYS/
VPT_STREAM_MT/VPT_CLUSTER_SIZE/... change the schedule).  A stray exported
var from a probe session must not silently alter a golden or benchmark run
(VERDICT r4, weak #5), so:

  * modules that read an ablation knob call `guard_ablations()` at import —
    it raises if `VPT_REQUIRE_GOLDENS` is set (the goldens-are-mandatory CI
    mode, tests/test_golden.py) while any knob deviates from its default;
  * `bench.py` calls `require_clean_env()` which rejects ANY `VPT_*` var,
    including pure tuning knobs, so the committed artifact always measures
    the default configuration.
"""

from __future__ import annotations

import os

# Knobs that change RESULTS (not just speed) when moved off their default.
ABLATION_DEFAULTS = {
    "VPT_STREAM_ABLATE": "",   # skips kernel stages -> corrupt renders
    "VPT_TRACE": "stream",     # packet backend: same results, not the prod path
    "VPT_SORT_RAYS": "1",
    "VPT_STREAM_MT": "dense",
    # Schedule knobs (same results, different drain/vector trade) — fenced
    # so a probe session can't leave a non-default schedule in a golden or
    # bench run.
    "VPT_CAPS_EVERY": "1",     # tighten per-supertile caps every Nth group
    "VPT_ROW_GATE": "gated",   # "all" = unconditional rows, no word drains
}


def poisoned_ablations() -> list[str]:
    """Names of ablation vars currently set to a non-default value."""
    return [
        name
        for name, default in ABLATION_DEFAULTS.items()
        if os.environ.get(name, default) != default
    ]


def guard_ablations() -> None:
    """Raise if goldens are mandated while an ablation var is poisoned.

    Called at import time by the modules that read the knobs, so a golden
    run under VPT_REQUIRE_GOLDENS cannot even load a corrupted trace path.
    """
    if not os.environ.get("VPT_REQUIRE_GOLDENS"):
        return
    bad = poisoned_ablations()
    if bad:
        raise RuntimeError(
            "VPT_REQUIRE_GOLDENS is set but ablation env vars deviate from "
            f"their defaults: {bad}. Unset them — golden runs must use the "
            "production trace path."
        )


def require_clean_env() -> None:
    """Reject ANY VPT_* env var (benchmarks measure the default config)."""
    bad = sorted(k for k in os.environ if k.startswith("VPT_"))
    bad = [k for k in bad if k != "VPT_REQUIRE_GOLDENS"]
    if bad:
        raise RuntimeError(
            f"benchmark refuses to run with VPT_* env vars set: {bad}. "
            "The committed artifact must measure the default configuration."
        )
