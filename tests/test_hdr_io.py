"""Radiance RGBE .hdr export/import (stb_image/stb_image_write parity —
the reference's env maps are .hdr files loaded via stb, PathTracer.cpp)."""

import numpy as np

from vpt_tpu.io.image import load_radiance_hdr, save_hdr, save_radiance_hdr


def test_rgbe_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((33, 47, 3)).astype(np.float32) ** 2) * 1000.0
    img[0, 0] = 0.0  # zero pixel
    img[1, 1] = [1e-4, 5e5, 2.0]  # huge dynamic range in one pixel
    p = str(tmp_path / "x.hdr")
    save_radiance_hdr(p, img)
    back = load_radiance_hdr(p)
    assert back.shape == img.shape
    # Shared-exponent 8-bit mantissas: ~0.4% relative error on the max
    # channel; smaller channels quantize relative to the max channel.
    mx = img.max(-1, keepdims=True)
    np.testing.assert_allclose(back, img, atol=1e-30 + 0.01 * mx.max())
    rel = np.abs(back - img) / np.maximum(mx, 1e-9)
    assert rel.max() < 0.01
    assert np.all(back[0, 0] == 0.0)


def test_flat_file_with_trailing_bytes(tmp_path):
    # Some writers pad after the pixel data; a flat file must still load
    # (ADVICE r2: an exact whole-file length match rejected valid files).
    img = np.ones((4, 12, 3), np.float32) * 3.0
    p = str(tmp_path / "pad.hdr")
    save_radiance_hdr(p, img)
    with open(p, "ab") as f:
        f.write(b"\x00\x00\x00junk")
    back = load_radiance_hdr(p)
    np.testing.assert_allclose(back, img, rtol=0.01)


def test_old_style_rle_scanlines(tmp_path):
    # Old-style RLE ((1,1,1,count) repeat markers) is legal for width < 8 or
    # > 32767; hand-assemble a 2x4 file using it.
    rows = [
        # row 0: pixel A then repeat x3
        bytes([128, 64, 32, 130]) + bytes([1, 1, 1, 3]),
        # row 1: four literal pixels
        bytes([10, 20, 30, 129]) * 4,
    ]
    p = str(tmp_path / "old.hdr")
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 2 +X 4\n")
        f.write(b"".join(rows))
    back = load_radiance_hdr(p)
    assert back.shape == (2, 4, 3)
    # all 4 pixels of row 0 equal
    assert np.all(back[0] == back[0, 0])
    assert np.all(back[1] == back[1, 0])
    assert back[0, 0, 0] > back[1, 0, 0]  # exponent 130 vs 129


def test_save_hdr_dispatches_on_extension(tmp_path):
    img = np.ones((4, 4, 3), np.float32) * 2.5
    p_hdr = str(tmp_path / "a.hdr")
    p_npy = str(tmp_path / "b.npy")
    save_hdr(p_hdr, img)
    save_hdr(p_npy, img)
    assert open(p_hdr, "rb").read(10).startswith(b"#?RADIANCE")
    np.testing.assert_allclose(np.load(p_npy), img)
    np.testing.assert_allclose(load_radiance_hdr(p_hdr), img, rtol=0.01)


def test_loader_reads_our_files_via_envmap(tmp_path):
    """The env-map loader path accepts our .hdr files (imageio backend)."""
    from vpt_tpu.scene.envmap import load_hdr

    img = np.abs(np.random.default_rng(1).normal(1.0, 0.5, (8, 16, 3))).astype(np.float32)
    p = str(tmp_path / "env.hdr")
    save_radiance_hdr(p, img)
    back = load_hdr(p)
    # RGBE shares one exponent per pixel: error scales with the pixel max.
    mx = img.max(-1, keepdims=True)
    assert (np.abs(back - img) / np.maximum(mx, 1e-9)).max() < 0.01
