"""Structured per-dispatch metrics logging (JSONL).

SURVEY §5's tracing/observability analog of the reference's per-frame
counters (PathTracer.cpp timing + the editor's ms/frame readout): every
progressive dispatch appends one JSON record, so long renders leave a
machine-readable trace (throughput regressions, relay stalls, convergence
rate) instead of a scrolling console.

Usage:
    r = Renderer(scene, metrics_log="render_log.jsonl")
    # or: r.metrics = RenderLog.open("render_log.jsonl")
Each record: ts, frame, seed, spp, wall_s, segments, segs_per_s,
samples_accumulated, resolution, scene, and an `event` tag ("dispatch",
"compile", "reset", "note").
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional


class RenderLog:
    """Append-only JSONL writer with a couple of convenience aggregates."""

    def __init__(self, fh: Optional[IO[str]], path: Optional[str] = None):
        self._fh = fh
        self.path = path
        self.records = 0
        self._t_open = time.time()

    @classmethod
    def open(cls, path: str) -> "RenderLog":
        return cls(open(path, "a", buffering=1), path)

    @classmethod
    def null(cls) -> "RenderLog":
        return cls(None)

    def write(self, event: str, **fields) -> dict:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        self.records += 1
        return rec

    def dispatch(self, *, frame, seed, spp, wall_s, segments, samples_accumulated,
                 resolution, scene) -> dict:
        return self.write(
            "dispatch",
            frame=int(frame),
            seed=int(seed),
            spp=int(spp),
            wall_s=round(float(wall_s), 4),
            segments=float(segments),
            segs_per_s=round(float(segments) / max(float(wall_s), 1e-9), 1),
            samples_accumulated=int(samples_accumulated),
            resolution=list(resolution),
            scene=str(scene),
        )

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
