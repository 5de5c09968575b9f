"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU with 8 virtual devices so mesh/pjit/collective code paths
are exercised without TPU hardware (standard JAX testing trick; the
reference has no test suite at all — see SURVEY.md §4).

Env must be set before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
