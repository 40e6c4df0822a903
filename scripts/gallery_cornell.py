"""Reconstruct the gallery CornellBox scene and score SSIM against
/root/reference/Gallery/CornellBox.png.

The committed Assets/CornellBox.gltf has NO boxes (walls/ceiling/floor/area
light only — verified from its JSON); the gallery image was rendered from
an editor-modified scene with two boxes, the SHORT one strongly emissive
(it is clearly the main light: the ceiling shows no bright patch and all
wall shadows radiate from the short box).  This script loads the committed
gltf, disables the ceiling light, adds the two boxes at image-derived
positions (perspective inversion of corner pixels: camera z=15.018,
yfov 45deg), renders, and prints SSIM.

Box parameters are CLI-overridable for placement sweeps:
  python scripts/gallery_cornell.py [size] [spp] [emissive_scale]
Writes /tmp/gallery_ours.png for eyeballing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssim_reference import ssim


def build_scene(emissive_scale=14.0):
    from vpt_tpu.scene.gltf import load_gltf
    from vpt_tpu.scene.procedural import make_box
    from vpt_tpu.scene.types import Instance, Material

    scene = load_gltf("/root/reference/Assets/CornellBox.gltf")
    # The ceiling area light is off in the gallery shot.
    for m in scene.materials:
        if max(m.emissive_color) > 0:
            m.emissive_color = (0.0, 0.0, 0.0)

    def add_box(size_xyz, center, yaw_deg, mat_idx, name):
        mesh = make_box(size_xyz)
        t = np.eye(4, dtype=np.float32)
        a = np.radians(yaw_deg)
        t[:3, :3] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        t[:3, 3] = center
        scene.meshes.append(mesh)
        scene.instances.append(
            Instance(mesh=len(scene.meshes) - 1, material=mat_idx,
                     transform=t, name=name)
        )

    scene.materials.append(Material(name="box-white",
                                    base_color=(0.73, 0.73, 0.73)))
    white_idx = len(scene.materials) - 1
    scene.materials.append(Material(
        name="box-light", base_color=(0.78, 0.78, 0.78),
        emissive_color=(1.0 * emissive_scale, 0.93 * emissive_scale,
                        0.72 * emissive_scale),
    ))
    light_idx = len(scene.materials) - 1

    floor_y = -5.54
    # Image-derived: tall box ~3.5 x 7.1 x 3.5 front at z~-4.5, left of
    # center; short box ~3.8 cube-ish, right of center, nearer the camera.
    tall_h = 7.1
    add_box((3.5, tall_h, 3.5), (-1.8, floor_y + tall_h / 2, -6.3), 4.0,
            white_idx, "tall-box")
    short_h = 3.5
    add_box((3.8, short_h, 3.8), (1.5, floor_y + short_h / 2, -3.4), -6.0,
            light_idx, "short-box")
    return scene


def main():
    from PIL import Image

    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    escale = float(sys.argv[3]) if len(sys.argv) > 3 else 14.0

    scene = build_scene(escale)
    r = Renderer(
        scene, width=size, height=size,
        flags=RenderFlags(max_depth=32, max_medium_events=2),
        samples_per_frame=8, max_samples=spp,
    )
    r.render(verbose=True)
    ours = np.asarray(r.output_image())
    Image.fromarray((np.clip(ours, 0, 1) * 255).astype(np.uint8)).save(
        "/tmp/gallery_ours.png")

    ref = Image.open("/root/reference/Gallery/CornellBox.png").convert("RGB")
    ref = np.asarray(ref.resize((size, size), Image.LANCZOS), np.float32) / 255.0
    Image.fromarray((ref * 255).astype(np.uint8)).save("/tmp/gallery_ref.png")
    val = ssim(ours, ref)
    scale = ref.mean() / max(ours.mean(), 1e-9)
    val_m = ssim(np.clip(ours * scale, 0, 1), ref)
    print(f"SSIM={val:.4f}  SSIM(mean-matched x{scale:.3f})={val_m:.4f}  "
          f"size={size} spp={spp} emissive={escale}")


if __name__ == "__main__":
    main()
