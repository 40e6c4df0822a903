import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.core import rng
from vpt_tpu.render import volumes as vol_mod
from vpt_tpu.scene.build import build_volume_table
from vpt_tpu.scene.types import Volume


def _states(n, seed=3):
    return rng.seed(jnp.arange(n, dtype=jnp.uint32), 0, seed)


def _rays_through_origin(n):
    org = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    return jnp.asarray(org), jnp.asarray(d)


def test_intersect_aabb_conventions():
    o = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0], [10.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far = vol_mod.intersect_aabb(o, d, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]))
    np.testing.assert_allclose(np.asarray(near), [4.0, -1.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(far), [6.0, -1.0, -1.0], atol=1e-5)


def test_homogeneous_scatter_distance_distribution():
    """Free-flight distances inside a homogeneous box follow exp(density)."""
    vt = build_volume_table([Volume(density=2.0)])
    n = 100_000
    org, d = _rays_through_origin(n)
    state = _states(n)
    state, t = vol_mod.scatter_distance_in_volume(state, vt, 0, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    t = np.asarray(t)
    scattered = t >= 0
    # P(scatter within 2 units at density 2) = 1 - e^-4
    assert abs(scattered.mean() - (1 - np.exp(-4))) < 0.01
    # Entry at t=4; scatter distances start there
    assert t[scattered].min() >= 4.0
    inside = t[scattered] - 4.0
    # Truncated-exponential mean on [0,2]: 1/2 - 2/(e^4 - 1)
    expected = 0.5 - 2.0 / (np.exp(4.0) - 1.0)
    assert abs(inside.mean() - expected) < 0.01


def test_homogeneous_transmittance_analytic():
    vt = build_volume_table([Volume(density=0.7)])
    n = 1024
    org, d = _rays_through_origin(n)
    state = _states(n)
    state, tr = vol_mod.volumes_transmittance(state, vt, 1, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(tr), np.exp(-0.7 * 2.0), atol=1e-5)


@pytest.mark.slow
def test_heterogeneous_matches_homogeneous_for_constant_grid():
    """A constant-density grid must reproduce the homogeneous statistics."""
    grid = np.ones((16, 16, 16), np.float32)
    vt = build_volume_table([Volume(density=1.5, density_grid=grid)])
    n = 50_000
    org, d = _rays_through_origin(n)
    state = _states(n, 9)
    state, t = vol_mod.scatter_distance_in_volume(state, vt, 0, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    t = np.asarray(t)
    expect = 1 - np.exp(-1.5 * 2.0)
    assert abs((t >= 0).mean() - expect) < 0.02

    state, tr = vol_mod.volumes_transmittance(state, vt, 1, org, d, jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    # Ratio-tracked transmittance is an unbiased estimate of exp(-3)
    assert abs(float(np.asarray(tr).mean()) - np.exp(-3.0)) < 0.02


@pytest.mark.slow
def test_volume_render_smoke():
    """Cornell + a scattering box: image stays finite and the volume darkens
    and scatters light (mean changes vs no volume)."""
    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags
    from vpt_tpu.scene.procedural import cornell_box

    scene = cornell_box(with_boxes=False)
    flags = RenderFlags(max_depth=6, max_medium_events=2)
    r = Renderer(scene, width=32, height=32, flags=flags, samples_per_frame=4,
                 max_samples=8, lookup_tables=None)
    base = r.render().copy()

    r2 = Renderer(scene, width=32, height=32, flags=flags, samples_per_frame=4,
                  max_samples=8, lookup_tables=None)
    r2.add_volume(Volume(corner_min=(-0.8, -0.8, -0.8), corner_max=(0.8, 0.8, 0.8),
                         density=1.2, color=(0.9, 0.9, 0.9)))
    foggy = r2.render()
    assert np.isfinite(foggy).all()
    assert foggy.max() > 0
    assert abs(float(foggy.mean()) - float(base.mean())) > 1e-4


@pytest.mark.slow
def test_heterogeneous_volume_render_smoke():
    from vpt_tpu.api import Renderer
    from vpt_tpu.render.params import RenderFlags
    from vpt_tpu.scene.procedural import cornell_box
    from vpt_tpu.scene.vdb import procedural_cloud

    scene = cornell_box(with_boxes=False)
    r = Renderer(scene, width=24, height=24,
                 flags=RenderFlags(max_depth=5, max_medium_events=2),
                 samples_per_frame=2, max_samples=4, lookup_tables=None)
    r.add_volume(Volume(corner_min=(-0.7, -0.7, -0.7), corner_max=(0.7, 0.7, 0.7),
                        density=3.0, density_grid=procedural_cloud((32, 32, 32))))
    img = r.render()
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_merged_march_matches_per_volume_homogeneous():
    """The merged entry-sorted march (scatter_distance_merged) must agree
    with the per-volume loops statistically: two disjoint homogeneous
    boxes along one ray — scatter fractions, per-volume attribution, and
    transmittance all match the analytic values."""
    vols = [
        Volume(density=1.5, corner_min=(-1, -1, -1), corner_max=(1, 1, 1)),
        Volume(density=0.8, corner_min=(-1, -1, 2), corner_max=(1, 1, 4)),
    ]
    vt = build_volume_table(vols)
    n = 100_000
    org, d = _rays_through_origin(n)
    depth = jnp.zeros(n, jnp.int32)
    act = jnp.ones(n, bool)

    state = _states(n)
    state, t_m, vi_m = vol_mod.scatter_distance_merged(state, vt, 2, org, d, depth, act)
    t_m, vi_m = np.asarray(t_m), np.asarray(vi_m)

    # Analytic: volume 0 spans [4,6] (optical depth 3), volume 1 spans
    # [7,9] (optical depth 1.6).
    p0 = 1 - np.exp(-3.0)
    p1 = np.exp(-3.0) * (1 - np.exp(-1.6))
    frac0 = ((t_m >= 0) & (vi_m == 0)).mean()
    frac1 = ((t_m >= 0) & (vi_m == 1)).mean()
    assert abs(frac0 - p0) < 0.01, (frac0, p0)
    assert abs(frac1 - p1) < 0.01, (frac1, p1)
    # Attribution: scatters in [4,6] are volume 0, in [7,9] volume 1
    assert np.all(t_m[vi_m == 0] <= 6.0 + 1e-4)
    assert np.all(t_m[vi_m == 1] >= 7.0 - 1e-4)

    state, tr = vol_mod.volumes_transmittance_merged(state, vt, 2, org, d, depth, act)
    np.testing.assert_allclose(
        np.asarray(tr).mean(), np.exp(-3.0) * np.exp(-1.6), atol=1e-3
    )


@pytest.mark.slow
def test_merged_march_matches_per_volume_heterogeneous():
    """Merged march over one heterogeneous + one homogeneous volume agrees
    with running the per-volume loops and taking the min."""
    grid = np.full((16, 16, 16), 0.6, np.float32)
    vols = [
        Volume(density=1.0, density_grid=grid, corner_min=(-1, -1, -1), corner_max=(1, 1, 1)),
        Volume(density=0.9, corner_min=(-1, -1, 2), corner_max=(1, 1, 4)),
    ]
    vt = build_volume_table(vols)
    n = 60_000
    org, d = _rays_through_origin(n)
    depth = jnp.zeros(n, jnp.int32)
    act = jnp.ones(n, bool)

    state = _states(n, seed=11)
    state, t_m, vi_m = vol_mod.scatter_distance_merged(state, vt, 2, org, d, depth, act)
    t_m = np.asarray(t_m)

    # Reference result from the per-volume path
    state2 = _states(n, seed=12)
    best = np.full(n, -1.0, np.float32)
    for vi in range(2):
        state2, t_v = vol_mod.scatter_distance_in_volume(state2, vt, vi, org, d, depth, act)
        t_v = np.asarray(t_v)
        closer = (t_v >= 0) & ((t_v < best) | (best < 0))
        best = np.where(closer, t_v, best)

    assert abs((t_m >= 0).mean() - (best >= 0).mean()) < 0.01
    m_in = t_m[t_m >= 0]
    b_in = best[best >= 0]
    assert abs(m_in.mean() - b_in.mean()) < 0.03
    # Transmittance paths agree too
    state, tr_m = vol_mod.volumes_transmittance_merged(state, vt, 2, org, d, depth, act)
    state2, tr_p = vol_mod.volumes_transmittance(state2, vt, 2, org, d, depth, act)
    assert abs(np.asarray(tr_m).mean() - np.asarray(tr_p).mean()) < 0.01
