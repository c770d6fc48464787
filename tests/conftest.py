"""Test configuration.

Runs everything on CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 implications; the analog of the
reference testing against whatever adapter is present,
tests/common/test_context.rs:11-38).

Note: this environment's sitecustomize registers a remote-TPU (axon) backend
at interpreter start and may already have imported jax, so plain env vars are
too late — override through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
