"""Structured per-dispatch metrics logging (SURVEY §5 observability)."""

import json

import pytest
import numpy as np

from vpt_tpu.api import Renderer
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box


def test_metrics_log_records_dispatches(tmp_path):
    path = str(tmp_path / "log.jsonl")
    r = Renderer(
        cornell_box(with_boxes=False), width=24, height=24,
        flags=RenderFlags(max_depth=2, max_medium_events=0),
        samples_per_frame=2, max_samples=6, lookup_tables=None,
        metrics_log=path,
    )
    r.render()
    lines = [json.loads(x) for x in open(path)]
    disp = [x for x in lines if x["event"] == "dispatch"]
    assert len(disp) == 3
    assert disp[0]["frame"] == 1 and disp[-1]["samples_accumulated"] == 6
    for d in disp:
        assert d["segments"] > 0 and d["segs_per_s"] > 0 and d["wall_s"] > 0
        assert d["resolution"] == [24, 24] and d["scene"] == "cornell"
    # The in-memory aggregates agree with the log.
    assert abs(sum(d["segments"] for d in disp) - r.segments_traced) < 1e-3


@pytest.mark.slow
def test_metrics_log_null_by_default():
    r = Renderer(
        cornell_box(with_boxes=False), width=16, height=16,
        flags=RenderFlags(max_depth=2, max_medium_events=0),
        samples_per_frame=1, max_samples=1, lookup_tables=None,
    )
    r.render()
    assert r.metrics.path is None and r.metrics.records >= 1
