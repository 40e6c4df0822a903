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
