"""Golden-image regression tests (SURVEY §4: the reference's quality gate is
its visual gallery; ours is quantitative — SSIM against committed goldens and
cross-validation between independent intersection paths)."""

import dataclasses
import os

import numpy as np
import pytest

from vpt_tpu.api import Renderer
from vpt_tpu.io.metrics import psnr, ssim
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box, sphere_garden

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _render_cornell(spp=32):
    r = Renderer(
        cornell_box(), width=64, height=64,
        flags=RenderFlags(max_depth=6, max_medium_events=2),
        samples_per_frame=spp, max_samples=spp, lookup_tables=None,
    )
    r._seed_counter = 41  # fixed seed stream
    r.path_trace()
    return r.hdr_image()


@pytest.mark.slow
def test_cornell_golden():
    """Render must stay statistically identical to the committed golden."""
    img = _render_cornell()
    path = os.path.join(GOLDEN_DIR, "cornell_64_32spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden generated on first run; commit it")
    golden = np.load(path)
    # Same seeds + same platform => near bit-identical; allow tiny drift
    # from compiler changes.
    s = ssim(img, golden)
    assert s > 0.98, f"SSIM vs golden: {s:.4f}"


@pytest.mark.slow
def test_brute_vs_cluster_paths_agree():
    """The two independent intersection backends must produce the same
    image (same estimator, same seeds)."""
    scene = sphere_garden(grid=3)
    flags = RenderFlags(max_depth=4, max_medium_events=2)

    imgs = []
    for brute in (True, False):
        r = Renderer(scene, width=48, height=48, flags=flags,
                     samples_per_frame=16, max_samples=16, lookup_tables=None)
        r.meta = dataclasses.replace(r.meta, use_brute_force=brute)
        r._seed_counter = 7
        r.path_trace()
        imgs.append(r.hdr_image())
    # Identical RNG streams -> identical sample decisions; intersection
    # backends agree on hits, so images should match almost exactly.
    assert np.isfinite(imgs[0]).all() and np.isfinite(imgs[1]).all()
    p = psnr(np.clip(imgs[0], 0, 10), np.clip(imgs[1], 0, 10), data_range=10.0)
    assert p > 40.0, f"brute vs cluster PSNR {p:.1f} dB"


@pytest.mark.slow
def test_tonemapped_golden_png():
    """Export path end-to-end: tonemap + PNG encode/decode roundtrip."""
    from vpt_tpu.io.image import load_png, save_png
    from vpt_tpu.post.tonemap import tonemap

    img = _render_cornell(spp=8)
    ldr = np.asarray(tonemap(img))
    tmp = os.path.join(GOLDEN_DIR, "_tmp_roundtrip.png")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_png(tmp, ldr)
    back = load_png(tmp)
    os.remove(tmp)
    assert back.shape == ldr.shape
    assert np.abs(back - ldr).max() < 1 / 255 + 1e-3
