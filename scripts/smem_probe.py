"""Probe how much SMEM a Pallas TPU kernel can take as operands.

Determines whether per-cluster metadata (aabb+cnt+base, 8 f32 each) can stay
in SMEM at Sponza scale (C ~ 2048 -> 64 KB) or must ride the DMA'd blocks.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    # Touch a couple of scalars so the operand isn't dead.
    o_ref[0, 0] = x_ref[0, 0] + x_ref[0, x_ref.shape[1] - 1]


def probe(n_floats):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, n_floats), lambda: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    x = jnp.arange(n_floats, dtype=jnp.float32).reshape(1, n_floats)
    return float(f(x)[0, 0])


if __name__ == "__main__":
    for kb in [16, 32, 64, 128, 256, 512, 1024]:
        n = kb * 256  # floats
        try:
            v = probe(n)
            print(f"SMEM {kb:5d} KB: OK (checksum {v})", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"SMEM {kb:5d} KB: FAIL {msg}", flush=True)
            sys.exit(0)
