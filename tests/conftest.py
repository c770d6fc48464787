"""Test configuration.

Runs everything on CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 implications; the analog of the
reference testing against whatever adapter is present,
tests/common/test_context.rs:11-38). Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
