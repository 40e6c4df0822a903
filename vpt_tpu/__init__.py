"""vpt_tpu — a TPU-native physically-based wavefront path tracer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
Zydak/Vulkan-Path-Tracer reference (progressive offline path tracing with a
full multi-lobe BSDF, NEE+MIS for environment maps and emissive meshes,
nested dielectric media, heterogeneous volumes, a path-traced atmosphere and
an ACES/bloom post pipeline).  The Vulkan RT megakernel becomes SoA wavefront
stages under `jit`; the hardware BVH becomes our own flattened BVH with
masked stackless traversal; progressive accumulation, checkpointing and
multi-chip sharding ride `jax.sharding` over an ICI mesh.

Public API mirrors the reference's `PathTracer` host interface
(/root/reference/PathTracer/PathTracer.h:83-183) as `vpt_tpu.Renderer`.
"""

__version__ = "0.1.0"

from vpt_tpu.api import Renderer  # noqa: E402,F401
from vpt_tpu.render.params import RenderParams, RenderFlags  # noqa: E402,F401
