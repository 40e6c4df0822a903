"""Parity of the Pallas envelope kernels (accel/envelope.py) against the
XLA (N, G) slab/argmin chain they replaced (interpret mode, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vpt_tpu.accel import envelope

T_MIN = 1e-4


def _xla_ent(origin, inv, tmax, gmin, gmax, t_min):
    """Reference (N, Gp) entry matrix: the old stream.py formula."""
    n = origin.shape[0]
    gp = gmin.shape[1]
    tn = np.full((n, gp), t_min, np.float32)
    tf = np.broadcast_to(tmax[:, None], (n, gp)).copy()
    for ax in range(3):
        s0 = (gmin[ax][None, :] - origin[:, ax : ax + 1]) * inv[:, ax : ax + 1]
        s1 = (gmax[ax][None, :] - origin[:, ax : ax + 1]) * inv[:, ax : ax + 1]
        tn = np.maximum(tn, np.minimum(s0, s1))
        tf = np.minimum(tf, np.maximum(s0, s1))
    return np.where(tn <= tf, tn, np.inf).astype(np.float32)


def _scene(seed, n=2048, g=61, gp=128):
    rs = np.random.RandomState(seed)
    lo = rs.uniform(-8, 6, (g, 3)).astype(np.float32)
    hi = lo + rs.uniform(0.1, 4, (g, 3)).astype(np.float32)
    # duplicate a box to exercise entry-t ties
    lo[5], hi[5] = lo[3], hi[3]
    gmin = np.concatenate([lo, np.full((gp - g, 3), 3e9, np.float32)]).T
    gmax = np.concatenate([hi, np.full((gp - g, 3), 3e9, np.float32)]).T
    o = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[7] = (1.0, 0.0, 0.0)  # axis-aligned: zero components
    d[8] = (0.0, 0.0, 1.0)
    o[9] = (lo[0] + hi[0]) / 2  # starts inside a box
    tmax = rs.uniform(0.5, 50, n).astype(np.float32)
    tmax[:64] = T_MIN  # inactive block
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20).astype(np.float32)
    return o, d, inv, tmax, gmin, gmax, gp


@pytest.mark.parametrize("levels", [1, 2])
def test_ray_keys_matches_xla_chain(levels):
    o, d, inv, tmax, gmin, gmax, gp = _scene(0)
    ent = _xla_ent(o, inv, tmax, gmin, gmax, T_MIN)
    sentinel = gp
    g0 = np.argmin(ent, axis=1)
    v0 = np.min(ent, axis=1)
    l0 = np.where(np.isfinite(v0), g0, sentinel)
    if levels == 2:
        rem = np.where(np.arange(gp)[None, :] == g0[:, None], np.inf, ent)
        g1 = np.argmin(rem, axis=1)
        v1 = np.min(rem, axis=1)
        l1 = np.where(np.isfinite(v1), g1, sentinel)
        want = l0 * (gp + 1) + l1
    else:
        want = l0
    got = np.asarray(
        envelope.ray_keys(
            jnp.asarray(o), jnp.asarray(inv), jnp.asarray(tmax),
            jnp.asarray(gmin), jnp.asarray(gmax),
            t_min=T_MIN, levels=levels, interpret=True,
        )
    )
    mismatch = got != want
    assert not mismatch.any(), (
        f"{mismatch.sum()} key mismatches, first at ray "
        f"{np.argmax(mismatch)}: got {got[mismatch][:5]} want {want[mismatch][:5]}"
    )


def test_supertile_tables_matches_xla_chain():
    o, d, inv, tmax, gmin, gmax, gp = _scene(1)
    n = o.shape[0]
    ent = _xla_ent(o, inv, tmax, gmin, gmax, T_MIN)
    s = n // 1024
    want = np.min(ent.reshape(s, 1024, gp), axis=1)
    got = np.asarray(
        envelope.supertile_tables(
            jnp.asarray(o), jnp.asarray(inv), jnp.asarray(tmax),
            jnp.asarray(gmin), jnp.asarray(gmax),
            t_min=T_MIN, interpret=True,
        )
    )
    assert got.shape == (s, gp)
    both_inf = np.isinf(want) & np.isinf(got)
    close = np.isclose(got, want, rtol=0, atol=0) | both_inf
    assert close.all(), (
        f"{(~close).sum()} table mismatches: got {got[~close][:5]} "
        f"want {want[~close][:5]}"
    )


def test_keys_all_miss_and_inactive_sentinel():
    """Rays that enter nothing (or are inactive via tmax=t_min away from
    geometry) must produce the pure-sentinel key."""
    gp = 128
    gmin = np.full((3, gp), 3e9, np.float32)
    gmin[:, 0] = (0.0, 0.0, 0.0)
    gmax = np.full((3, gp), 3e9, np.float32)
    gmax[:, 0] = (1.0, 1.0, 1.0)
    n = 1024
    o = np.full((n, 3), 5.0, np.float32)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))  # away
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20).astype(np.float32)
    tmax = np.full(n, 100.0, np.float32)
    key = np.asarray(
        envelope.ray_keys(
            jnp.asarray(o), jnp.asarray(inv), jnp.asarray(tmax),
            jnp.asarray(gmin), jnp.asarray(gmax),
            t_min=T_MIN, levels=2, interpret=True,
        )
    )
    assert (key == gp * (gp + 1) + gp).all()
