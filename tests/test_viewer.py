"""Headless tests for the interactive terminal viewer (vpt_tpu.viewer).

Covers the Editor.cpp:81-143 capabilities: progressive dispatch per tick,
camera-move accumulation reset (Editor::OnUpdate camera-moved check),
FlyCamera WASD/look consumption, and the ANSI half-block frame encoding.
"""

import numpy as np
import pytest

from vpt_tpu.api import Renderer
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box
from vpt_tpu.viewer import TerminalViewer


@pytest.fixture(scope="module")
def viewer():
    r = Renderer(
        cornell_box(), width=32, height=32,
        flags=RenderFlags(max_depth=3, max_medium_events=2),
        samples_per_frame=1, max_samples=8, lookup_tables=None,
    )
    return TerminalViewer(r, cols=24)


def test_step_progresses_and_renders(viewer):
    frame = viewer.step()
    assert viewer.r.samples_accumulated == 1
    assert "▀" in frame and "\x1b[38;2;" in frame
    assert "1/8 spp" in frame
    frame = viewer.step()
    assert viewer.r.samples_accumulated == 2


def test_camera_move_resets_accumulation(viewer):
    viewer.step()
    pos0 = viewer.r.camera.position.copy()
    assert viewer.r.samples_accumulated > 0
    frame = viewer.step("w")
    # FlyCamera moved along front, accumulation restarted at this tick.
    assert not np.allclose(viewer.r.camera.position, pos0)
    assert viewer.r.samples_accumulated == 1
    assert "1/8 spp" in frame


def test_look_keys_rotate(viewer):
    yaw0, pitch0 = viewer.r.camera.yaw, viewer.r.camera.pitch
    viewer.apply_keys("jki")
    assert viewer.r.camera.yaw != yaw0
    # i then k cancel: pitch unchanged net of clipping
    assert abs(viewer.r.camera.pitch - pitch0) < 1e-6


def test_speed_keys_do_not_reset(viewer):
    viewer.step()
    acc = viewer.r.samples_accumulated
    s0 = viewer.move_speed
    moved = viewer.apply_keys("+")
    assert not moved and viewer.move_speed > s0
    assert viewer.r.samples_accumulated == acc


def test_ansi_frame_shape(viewer):
    img = np.zeros((32, 32, 3), np.float32)
    img[:16] = [1.0, 0.0, 0.0]
    frame = viewer.ansi_frame(img)
    lines = frame.splitlines()
    # 24 cols -> 24 rows resampled -> 12 half-block lines + status
    assert len(lines) == 13
    assert "38;2;255;0;0" in lines[0]
    assert "38;2;0;0;0" in lines[-2]


def test_run_requires_tty(viewer, monkeypatch):
    import sys

    monkeypatch.setattr(sys, "stdin", type("S", (), {"isatty": lambda s: False})())
    with pytest.raises(RuntimeError):
        viewer.run()
