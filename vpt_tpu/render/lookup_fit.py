"""Gather-free energy-compensation lookups: tensor-Chebyshev fits.

The reference samples its baked Turquin tables with Texture2DArray bilinear
fetches (Material.slang:146-165 via LookupTables); a literal port gathers
4 texels per lane, and arbitrary per-lane gathers on TPU cost ~0.5 us per
element — profiled at ~1.25 s of a 2.55 s dispatch.  Instead we fit each
baked table (vpt_tpu.render.lookup) once with a tensor-product Chebyshev
polynomial and evaluate it in vector registers (~300 fma/lane, no memory
traffic), ~4000x faster on TPU.

Fit quality (vs the 4096-sample MC-baked tables, which carry ~1% noise
themselves): reflect rms 5e-3; refract rms 8e-3 with the worst error
confined to ior<1.1 x grazing-angle corners where the glass lobes are
nearly invisible (at ior>=1.26 max err <=0.027).

The grid is a full tensor product, so the least-squares solve factorizes
into per-mode pseudo-inverses — no giant design matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Degrees (x=v.z column, y=roughness row, z=layer) per table.
REFLECT_DEG = (12, 10, 6)
REFRACT_DEG = (12, 10, 6)


def _cheb_basis(x: np.ndarray, deg: int) -> np.ndarray:
    """Chebyshev T_0..T_deg on [0, 1] (shifted): (n, deg+1)."""
    xs = 2.0 * x - 1.0
    t = [np.ones_like(x), xs]
    for _ in range(2, deg + 1):
        t.append(2.0 * xs * t[-1] - t[-2])
    return np.stack(t[: deg + 1], axis=-1)


def fit_table(table: np.ndarray, deg=(12, 10, 6)) -> np.ndarray:
    """Least-squares tensor-Chebyshev fit of a (L, H, W) lookup table.

    Grid coordinates are texel centers ((i+0.5)/n per axis), so evaluating
    the fit at u in [0,1] matches the reference's normalized texture
    coordinates.  Returns coefficients (dz+1, dy+1, dx+1) float32.
    """
    dx, dy, dz = deg
    nl, nh, nw = table.shape
    x = (np.arange(nw) + 0.5) / nw
    y = (np.arange(nh) + 0.5) / nh
    z = (np.arange(nl) + 0.5) / nl
    bx = np.linalg.pinv(_cheb_basis(x, dx))  # (dx+1, nw)
    by = np.linalg.pinv(_cheb_basis(y, dy))
    bz = np.linalg.pinv(_cheb_basis(z, dz))
    c = np.einsum("kl,jh,iw,lhw->kji", bz, by, bx, table.astype(np.float64))
    return c.astype(np.float32)


def constant_fit(value: float, deg=(12, 10, 6)) -> np.ndarray:
    """Coefficients of the constant function (used when tables are off)."""
    dx, dy, dz = deg
    c = np.zeros((dz + 1, dy + 1, dx + 1), np.float32)
    c[0, 0, 0] = value
    return c


def _cheb_vals(x, deg: int):
    """T_0..T_deg at x in [0,1] for batched jnp arrays: list of (N,)."""
    xs = 2.0 * x - 1.0
    t = [jnp.ones_like(x), xs]
    for _ in range(2, deg + 1):
        t.append(2.0 * xs * t[-1] - t[-2])
    return t[: deg + 1]


def eval_fit(coeffs: jnp.ndarray, u, v, w):
    """Evaluate a fit at (u=x/v.z axis, v=y/roughness, w=z/layer) in [0,1].

    Pure register math (the coefficient tensor is small enough that XLA
    keeps it resident); contraction order z->y->x keeps the live set at
    (dy+1)*(dx+1) scalars per lane.
    """
    dz1, dy1, dx1 = coeffs.shape
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    w = jnp.clip(w, 0.0, 1.0)
    tx = _cheb_vals(u, dx1 - 1)
    ty = _cheb_vals(v, dy1 - 1)
    tz = _cheb_vals(w, dz1 - 1)
    # sum_k Tz_k * sum_j Ty_j * sum_i c_kji Tx_i
    out = jnp.zeros_like(u)
    for k in range(dz1):
        acc_j = jnp.zeros_like(u)
        for j in range(dy1):
            acc_i = jnp.zeros_like(u)
            for i in range(dx1):
                acc_i = acc_i + coeffs[k, j, i] * tx[i]
            acc_j = acc_j + acc_i * ty[j]
        out = out + acc_j * tz[k]
    return out


def layer_coord(layer: jnp.ndarray, n_layers: int):
    """Map the reference's float layer index (nearest-layer semantics,
    e.g. (ior-1)*32) to the fit's z coordinate at texel centers."""
    return (jnp.clip(layer, 0.0, n_layers - 1.0) + 0.5) / n_layers


def get_lookup_fits(n_samples: int = 4096, cache_dir: str | None = None):
    """Fit (or load cached fits of) the three baked tables.

    Returns (reflect_c, refract_out_c, refract_in_c) float32 ndarrays.
    """
    import os

    from vpt_tpu.render.lookup import CACHE_DIR, get_lookup_tables

    cache_dir = cache_dir or CACHE_DIR
    tag = f"{n_samples}_{'x'.join(map(str, REFLECT_DEG))}"
    path = os.path.join(cache_dir, f"lookup_fits_{tag}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["reflect"], z["out"], z["in_"]
    reflect_t, refract_out, refract_in = get_lookup_tables(n_samples, cache_dir)
    fits = (
        fit_table(reflect_t, REFLECT_DEG),
        fit_table(refract_out, REFRACT_DEG),
        fit_table(refract_in, REFRACT_DEG),
    )
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(path, reflect=fits[0], out=fits[1], in_=fits[2])
    return fits
