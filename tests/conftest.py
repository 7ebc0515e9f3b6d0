"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use an
8-device virtual CPU mesh (the TPU analog of the reference's mock-model
"fake backend" testing strategy, SURVEY.md section 4).

Note: the `JAX_PLATFORMS` env var is ignored by this environment's axon
PJRT plugin, so we force the platform through the config API, which must
happen before any computation dispatches.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
