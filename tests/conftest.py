"""Test config: run all tests on a virtual 8-device CPU mesh with x64.

The driver separately dry-runs the multi-chip path via __graft_entry__.py;
tests here never require real TPU hardware (SURVEY §4 point 6: determinism,
not hardware, is the multi-worker test harness).

NOTE: this environment preloads a remote-TPU PJRT plugin via sitecustomize
and sets JAX_PLATFORMS=axon *before* any conftest code runs, so jax is
already imported here — env vars are too late.  jax.config.update is the
reliable way to force the local CPU backend for tests.
"""

import os

# Read by the CPU backend at first initialization (the remote backend may be
# registered already, but the CPU client is created lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
