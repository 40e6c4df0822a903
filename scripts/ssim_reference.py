"""SSIM against the reference's committed ground truth.

Renders /root/reference/Assets/CornellBox.gltf with the camera embedded in
the glTF and the reference's default tonemap (ACES, exposure 1, gamma 2.2,
PathTracer.h:197-233), then computes SSIM against the reference's own
Vulkan render /root/reference/Gallery/CornellBox.png (4096x4096,
downsampled to the render size).

Caveats (VERDICT r2 #5): the gallery image's spp, exposure, bloom settings
and exact resolution/aspect are not recorded in the reference repo, so
this is an INDICATIVE parity number, not a controlled comparison.

Usage: python scripts/ssim_reference.py [size] [spp]
Writes /tmp/ssim_ours.png + /tmp/ssim_ref.png for eyeballing and prints
one line: SSIM=<value>.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ssim(a, b, data_range=1.0):
    """Mean SSIM over 8x8 windows (Wang et al. 2004, uniform window)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return np.mean([ssim(a[..., c], b[..., c], data_range) for c in range(a.shape[-1])])
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    w = 8

    def tiles(x):
        h, wd = x.shape
        return x[: h - h % w, : wd - wd % w].reshape(h // w, w, wd // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)

    ta, tb = tiles(a), tiles(b)
    mu_a, mu_b = ta.mean(1), tb.mean(1)
    va, vb = ta.var(1), tb.var(1)
    cov = ((ta - mu_a[:, None]) * (tb - mu_b[:, None])).mean(1)
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def main():
    import jax.numpy as jnp
    from PIL import Image

    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags
    from vpt_tpu.scene.gltf import load_gltf

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    scene = load_gltf("/root/reference/Assets/CornellBox.gltf")
    # Reference default flags (PathTracer.h:197-233): depth 200 is overkill
    # for a closed box; 32 matches the gallery to noise level.
    r = Renderer(
        scene, width=size, height=size,
        flags=RenderFlags(max_depth=32, max_medium_events=2),
        samples_per_frame=8, max_samples=spp,
    )
    r.render(verbose=True)
    ours = np.asarray(r.output_image())  # ACES + gamma, (H, W, 3) in [0,1]
    Image.fromarray((np.clip(ours, 0, 1) * 255).astype(np.uint8)).save("/tmp/ssim_ours.png")

    ref = Image.open("/root/reference/Gallery/CornellBox.png").convert("RGB")
    ref = np.asarray(ref.resize((size, size), Image.LANCZOS), np.float32) / 255.0
    Image.fromarray((ref * 255).astype(np.uint8)).save("/tmp/ssim_ref.png")

    val = ssim(ours, ref)
    # Also report with a luminance-matched exposure (gallery exposure is
    # unrecorded): scale our linear-ish output to match the mean.
    scale = ref.mean() / max(ours.mean(), 1e-9)
    val_matched = ssim(np.clip(ours * scale, 0, 1), ref)
    print(f"SSIM={val:.4f}  SSIM(mean-matched x{scale:.3f})={val_matched:.4f}  "
          f"size={size} spp={spp}")


if __name__ == "__main__":
    main()
