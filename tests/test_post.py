import numpy as np
import jax.numpy as jnp

from vpt_tpu.post.bloom import bloom, downsample, threshold_extract, upsample_add
from vpt_tpu.post.tonemap import aces_fitted, agx_tonemap, tonemap


def test_aces_known_values():
    # ACES maps 0 -> ~0 and large values -> ~1, monotonic in between
    x = jnp.array([[[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0]], [[100.0, 100.0, 100.0]]])
    y = np.asarray(aces_fitted(x))
    assert y[0].max() < 0.01
    assert y[2].min() > 0.98
    assert (y[1] > y[0]).all() and (y[2] >= y[1]).all()
    assert y.min() >= 0.0 and y.max() <= 1.0


def test_tonemap_order_matches_reference():
    """Tonemap.slang:168-175: exposure, then gamma, then ACES."""
    img = jnp.full((4, 4, 3), 0.5)
    out = np.asarray(tonemap(img, exposure=2.0, gamma=2.2))
    manual = np.asarray(aces_fitted(jnp.power(img * 2.0, 1 / 2.2)))
    np.testing.assert_allclose(out, manual, atol=1e-6)


def test_agx_in_range():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 8, (8, 8, 3)).astype(np.float32))
    for look in ("default", "golden", "punchy"):
        y = np.asarray(agx_tonemap(img, look))
        assert np.isfinite(y).all()


def test_threshold_extract_window():
    img = jnp.zeros((4, 4, 3)).at[0, 0].set(10.0).at[1, 1].set(0.1)
    out = np.asarray(threshold_extract(img, 1.5, 0.5))
    assert out[0, 0, 0] > 9.9  # far above threshold: kept
    assert out[1, 1].max() == 0.0  # below window: removed


def test_down_up_sample_shapes():
    img = jnp.asarray(np.random.rand(64, 48, 3).astype(np.float32))
    lo = downsample(img, 1.0)
    assert lo.shape == (32, 24, 3)
    hi = upsample_add(lo, jnp.zeros_like(img), 1.0)
    assert hi.shape == img.shape


def test_bloom_spreads_bright_spot():
    img = jnp.zeros((64, 64, 3)).at[32, 32].set(50.0)
    b = np.asarray(bloom(img, threshold=1.0, strength=0.8, mip_levels=4))
    assert np.isfinite(b).all()
    # Bloom spreads energy away from the source pixel
    assert b[20:45, 20:45].sum() > 0
    assert b[36, 36].sum() > b[60, 60].sum()
