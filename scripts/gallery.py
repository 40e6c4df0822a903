"""Render the showcase gallery (the reference ships Gallery/*.png renders;
these are ours, produced on the TPU).  Run: python scripts/gallery.py [out]"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vpt_tpu.api import Renderer
from vpt_tpu.render.params import RenderFlags
from vpt_tpu.scene.procedural import cornell_box, sphere_garden
from vpt_tpu.scene.types import Material, Volume
from vpt_tpu.scene.vdb import procedural_cloud

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "Gallery"
)
SIZE = int(os.environ.get("GALLERY_SIZE", 320))
SPP = int(os.environ.get("GALLERY_SPP", 192))


def render(name, scene, flags=None, setup=None, spp=SPP, size=SIZE):
    t0 = time.time()
    r = Renderer(scene, width=size, height=size,
                 flags=flags or RenderFlags(max_depth=8, max_medium_events=4),
                 samples_per_frame=8, max_samples=spp)
    if setup:
        setup(r)
    r.render()
    path = os.path.join(OUT, f"{name}.png")
    r.save(path)
    print(f"{name}: {time.time()-t0:.0f}s, {r.samples_accumulated} spp -> {path}", flush=True)


def cornell_materials():
    scene = cornell_box()
    scene.materials.append(Material(name="glass", transmission=1.0, roughness=0.02, ior=1.5))
    scene.materials.append(Material(name="gold", base_color=(1.0, 0.77, 0.34), metallic=1.0, roughness=0.12))
    scene.instances[6].material = 4
    scene.instances[7].material = 5
    return scene


def main():
    os.makedirs(OUT, exist_ok=True)
    render("cornell_box", cornell_box())
    render("cornell_glass_gold", cornell_materials(), spp=SPP * 2)
    render("sphere_garden", sphere_garden(), flags=RenderFlags(max_depth=8, max_medium_events=4))

    def dof(r):
        r.set_focus_distance(3.2)
        r.set_dof_strength(0.18)

    render("cornell_dof", cornell_materials(), setup=dof)

    def smoke(r):
        r.add_volume(Volume(corner_min=(-0.6, -0.6, -0.6), corner_max=(0.6, 0.6, 0.6),
                            density=14.0, color=(0.3, 0.32, 0.36),
                            density_grid=procedural_cloud((48, 48, 48), coverage=0.6)))

    render("cornell_smoke", cornell_box(with_boxes=False), setup=smoke)

    # Emissive-bloom showcase
    def glow(r):
        r.post.enable_bloom = True
        r.post.bloom_threshold = 1.2
        r.post.bloom_strength = 0.6

    render("cornell_bloom", cornell_box(light_emission=(40, 30, 12)), setup=glow, spp=SPP)

    # Sponza-scale instanced scene (the bench scene)
    from vpt_tpu.scene.procedural import colonnade

    render("colonnade", colonnade(),
           flags=RenderFlags(max_depth=8, max_medium_events=2), spp=SPP)

    # Path-traced atmosphere
    from vpt_tpu.core.camera import look_at
    from vpt_tpu.scene.procedural import make_quad
    from vpt_tpu.scene.types import Instance, Scene

    ground = make_quad((-2000, -0.2, 2000), (2000, -0.2, 2000), (2000, -0.2, -2000), (-2000, -0.2, -2000))
    atmo_scene = Scene(
        meshes=[ground],
        instances=[Instance(mesh=0, material=0, transform=np.eye(4, dtype=np.float32))],
        materials=[Material(base_color=(0.35, 0.32, 0.28))],
        textures=[],
        camera_view=look_at((0.0, 2.0, 0.0), (0.0, 60.0, -400.0), (0.0, 1.0, 0.0)),
        camera_aspect=1.0,
        name="atmosphere",
    )

    # NOTE the planet placement: the reference's DEFAULT PlanetPosition
    # (PathTracer.h:222) puts the planet center 6360 km ABOVE the origin, so
    # with parity defaults a positive sun altitude is below the horizon and
    # the sky renders black (the round-1 near-black sunset).  Its users
    # reposition the planet in the editor; we do the same here: center below,
    # surface at y ~ 0, zenith = +y.
    def day(r):
        r.set_planet_position((0.0, -6360e3, 0.0))
        r.set_sky_altitude(30.0)

    def sunset(r):
        r.set_planet_position((0.0, -6360e3, 0.0))
        r.set_sky_altitude(2.0)

    atmo_flags = RenderFlags(max_depth=6, max_medium_events=6,
                             enable_atmosphere=True, enable_mesh_mis=False)
    render("atmosphere_day", atmo_scene, flags=atmo_flags, setup=day, spp=SPP)
    render("atmosphere_sunset", atmo_scene, flags=atmo_flags, setup=sunset, spp=SPP)

    # Reference glTF scene
    try:
        from vpt_tpu.scene.gltf import load_gltf

        render("viking_room", load_gltf("/root/reference/Assets/VikingRoom.gltf"),
               flags=RenderFlags(max_depth=6, max_medium_events=2), spp=SPP)
    except Exception as e:  # reference assets may be absent
        print("viking_room skipped:", e)


if __name__ == "__main__":
    main()
