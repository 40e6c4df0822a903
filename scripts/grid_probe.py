"""Measure Pallas grid-step overhead for the conveyor-kernel design.

The planned conveyor kernel runs a (S, K) grid where most steps are
no-ops (pad slots) and real steps DMA a ~160KB triangle group-block.
This probe measures, on the real chip:

  1. noop steps/s: grid of N steps whose index maps never change and
     whose body is a scalar branch that skips everything;
  2. dma steps/s: grid of N steps that each pull a fresh (8, 40, 128)
     f32 block (= one conveyor group-block) via the pipelined in_spec.

Usage: python scripts/grid_probe.py [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(n_steps: int, n_blocks: int, rotate: bool):
    rows = 40

    def kernel(tab_ref, blk_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(tab_ref[i] >= 0)
        def _work():
            out_ref[...] += blk_ref[0, :, 0, :]

    if rotate:
        def tris_map(i, tab):
            return (jax.lax.rem(tab[i], n_blocks), 0, 0, 0)
    else:
        def tris_map(i, tab):
            return (0, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, rows, 128), tris_map, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i, tab: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    tab = jnp.arange(n_steps, dtype=jnp.int32) if rotate else jnp.full(
        (n_steps,), -1, jnp.int32
    )
    tris = jnp.ones((n_blocks, 8, rows, 128), jnp.float32)

    g = jax.jit(lambda tb, tr: f(tb, tr))
    out = g(tab, tris)
    out.block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.time()
        out = g(tab, tris)
        out.block_until_ready()
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    label = "dma-rotate" if rotate else "noop-revisit"
    print(
        f"{label}: {n_steps} steps in {dt*1e3:.2f} ms median "
        f"-> {dt/n_steps*1e9:.0f} ns/step",
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    probe(n, 64, rotate=False)
    probe(n, 64, rotate=True)


if __name__ == "__main__":
    main()
