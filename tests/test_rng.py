import jax.numpy as jnp
import numpy as np

from vpt_tpu.core import rng


def _pcg_ref(x: int) -> int:
    """Reference PCG_HASH (Sampler.slang:4-9) in plain Python."""
    state = (x * 747796405 + 2891336453) & 0xFFFFFFFF
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    return ((word >> 22) ^ word) & 0xFFFFFFFF


def test_pcg_matches_reference_constants():
    xs = np.array([0, 1, 42, 12345, 0xDEADBEEF], np.uint32)
    got = np.asarray(rng.pcg_hash(jnp.asarray(xs)))
    want = np.array([_pcg_ref(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_uniform_float_range_and_mean():
    state = rng.seed(jnp.arange(100_000, dtype=jnp.uint32), 0, 123)
    state, u = rng.next_float(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_chain_decorrelated():
    state = rng.seed(jnp.arange(10_000, dtype=jnp.uint32), 0, 7)
    state, u1 = rng.next_float(state)
    state, u2 = rng.next_float(state)
    c = np.corrcoef(np.asarray(u1), np.asarray(u2))[0, 1]
    assert abs(c) < 0.05


def test_seed_depends_on_sample_and_frame():
    p = jnp.arange(16, dtype=jnp.uint32)
    s1 = np.asarray(rng.seed(p, 0, 1))
    s2 = np.asarray(rng.seed(p, 1, 1))
    s3 = np.asarray(rng.seed(p, 0, 2))
    assert not np.array_equal(s1, s2)
    assert not np.array_equal(s1, s3)


def test_float2_3_shapes():
    state = rng.seed(jnp.arange(8, dtype=jnp.uint32), 0, 0)
    _, f2 = rng.next_float2(state)
    _, f3 = rng.next_float3(state)
    assert f2.shape == (8, 2)
    assert f3.shape == (8, 3)
