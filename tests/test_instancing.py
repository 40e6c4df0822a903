"""Instancing (BLAS/TLAS re-expression) tests.

The reference keeps per-mesh BLASes and a TLAS of instance transforms
(/root/reference/PathTracer/PathTracer.cpp:433-502); vpt_tpu builds one
local-space cluster set per unique mesh and intersects instances by
transforming rays world->local per cluster.  These tests check that
instanced traces agree with brute force over the flattened triangles, that
blocks are genuinely shared between instances, and that non-uniform scales
and rotations are handled.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from vpt_tpu.accel import traverse
from vpt_tpu.scene.build import compile_scene
from vpt_tpu.scene.procedural import make_uv_sphere, make_box
from vpt_tpu.scene.types import Instance, Material, Scene, default_textures


def _tf(translate=(0, 0, 0), scale=(1, 1, 1), yaw=0.0):
    t = np.eye(4, dtype=np.float32)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rot = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    t[:3, :3] = rot @ np.diag(np.asarray(scale, np.float32))
    t[:3, 3] = translate
    return t


def _instanced_scene():
    sphere = make_uv_sphere(radius=1.0, n_lat=24, n_lon=48)  # 2208 tris
    box = make_box((1.0, 1.0, 1.0))
    mats = [Material(name="m", base_color=(0.8, 0.8, 0.8))]
    instances = [
        Instance(mesh=0, material=0, transform=_tf((-3, 0, 0))),
        Instance(mesh=0, material=0, transform=_tf((3, 0, 0), scale=(1.5, 0.6, 1.0), yaw=0.7)),
        Instance(mesh=0, material=0, transform=_tf((0, 2.5, -2), scale=(0.5, 0.5, 0.5))),
        Instance(mesh=1, material=0, transform=_tf((0, -2, 0), scale=(8.0, 0.5, 8.0))),
    ]
    return Scene(
        meshes=[sphere, box], instances=instances, materials=mats,
        textures=default_textures(), camera_view=np.eye(4, dtype=np.float32),
        name="instanced",
    )


def _flatten(scene):
    v0s, v1s, v2s = [], [], []
    for inst in scene.instances:
        mesh = scene.meshes[inst.mesh]
        idx = np.asarray(mesh.indices).reshape(-1, 3)
        m = np.asarray(inst.transform, np.float64)
        p = np.asarray(mesh.positions, np.float64) @ m[:3, :3].T + m[:3, 3]
        v0s.append(p[idx[:, 0]]); v1s.append(p[idx[:, 1]]); v2s.append(p[idx[:, 2]])
    v0 = np.concatenate(v0s).astype(np.float32)
    v1 = np.concatenate(v1s).astype(np.float32)
    v2 = np.concatenate(v2s).astype(np.float32)
    return v0, v1 - v0, v2 - v0


def test_blocks_shared_between_instances():
    data, meta, _ = compile_scene(_instanced_scene())
    cl = data.clusters
    n_real = int(np.asarray(cl.count > 0).sum())
    n_blocks = cl.tris_rk.shape[0]
    # 3 sphere instances share one block set; block rows < real clusters.
    assert n_blocks < n_real, (n_blocks, n_real)
    assert cl.inv_rows.shape[0] == 4
    # Cluster start values are virtual-id bases: strictly inside each
    # instance's range.
    starts = np.asarray(cl.start)[np.asarray(cl.count) > 0]
    assert starts.max() < meta.n_tris


def test_instanced_trace_matches_brute_force():
    scene = _instanced_scene()
    data, meta, _ = compile_scene(scene)
    assert not meta.use_brute_force  # must exercise the cluster path
    p0, e1, e2 = _flatten(scene)

    rng = np.random.default_rng(3)
    n = 512
    org = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    from vpt_tpu.accel.cluster import intersect_clusters

    hit = intersect_clusters(jnp.asarray(org), jnp.asarray(d), data.clusters)
    brute = traverse.intersect_brute(
        jnp.asarray(org), jnp.asarray(d),
        jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
    )
    # NOTE: brute tri ids are in flatten order; the cluster path returns
    # virtual ids in per-mesh-reordered order — compare t only.
    np.testing.assert_allclose(
        np.asarray(hit.t), np.asarray(brute.t), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_instanced_render_runs_and_shades():
    """End-to-end: the virtual-id shading tables resolve hits correctly."""
    from vpt_tpu.api import _render_step
    from vpt_tpu.core.camera import look_at, perspective
    from vpt_tpu.render.params import RenderFlags, default_params

    scene = _instanced_scene()
    scene.camera_view = look_at((0, 1.5, 9.0), (0, 0, 0), (0, 1, 0))
    sky = np.full((8, 16, 3), 1.0, np.float32)
    scene.env_map = sky
    data, meta, aux = compile_scene(scene, lookup_tables=None)
    proj = perspective(np.radians(45.0), 1.0)
    params = default_params(np.linalg.inv(scene.camera_view), np.linalg.inv(proj))
    flags = RenderFlags(max_depth=3, max_medium_events=0, enable_sky_mis=False,
                        use_energy_compensation=False)
    img, _ = _render_step(
        data, meta, flags, params, jnp.uint32(7), (48, 48),
        jnp.zeros((48, 48, 3), jnp.float32), jnp.int32(0), 4,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # Spheres + ground visible: image must have structure, sky ~1 elsewhere.
    assert img.std() > 0.05
    assert 0.2 < img.mean() < 1.2
