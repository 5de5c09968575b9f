"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU with 8 virtual devices so mesh/pjit/collective code paths
are exercised without TPU hardware (standard JAX testing trick; the
reference has no test suite at all — see SURVEY.md §4).

NOTE: this environment's sitecustomize registers an 'axon' TPU-tunnel
backend and *forces* ``jax_platforms="axon,cpu"`` via config.update,
which silently overrides the JAX_PLATFORMS env var.  The config.update
below (after jax import) is what actually pins tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is compile-dominated (~19 min cold);
# warm-cache reruns drop to a fraction of that.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Deterministic interpreter exit.  The axon PJRT plugin (registered for
# every python process by this environment's sitecustomize) has a C++
# teardown that can hang — or kill the process before stdio flushes,
# eating pytest's summary line.  All test work is finished by
# pytest_unconfigure: flush, then exit with pytest's real status, never
# entering the broken plugin teardown.
# ---------------------------------------------------------------------------

def pytest_sessionfinish(session, exitstatus):
    session.config._dlmcq_exitstatus = int(exitstatus)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    import os as _os
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    _os._exit(int(getattr(config, "_dlmcq_exitstatus", 0)))
