"""Test environment: force an 8-device virtual CPU mesh before JAX init.

Mirrors the framework's multi-chip design-testing strategy (SURVEY.md §4.4):
sharding/SP-invariance tests run on a virtual device mesh so distributed
behavior is covered on a single host.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
