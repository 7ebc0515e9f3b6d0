"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use an
8-device virtual CPU mesh (the TPU analog of the reference's mock-model
"fake backend" testing strategy, SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
