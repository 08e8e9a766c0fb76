"""Test environment: force an 8-device virtual CPU mesh.

Mirrors the framework's multi-chip design-testing strategy (SURVEY.md §4):
sharding/SP-invariance tests run on a virtual device mesh so distributed
behavior is covered on a single host.

The container boots with an `axon` TPU PJRT plugin registered from a
sitecustomize (JAX_PLATFORMS=axon in the env), so plain env vars are not
enough — we override through jax.config before any backend initializes.
Tests need CPU for deterministic fp32 numerics and virtual multi-device
meshes.
"""

import os

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
