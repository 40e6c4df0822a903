"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY §4: local mesh simulation via
xla_force_host_platform_device_count).

The environment's sitecustomize registers the axon TPU backend and pins
`jax_platforms=axon,cpu` via jax.config — env vars alone don't override it,
so we update the config after import (before any backend initializes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
