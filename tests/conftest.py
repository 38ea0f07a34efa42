"""Test harness: force an 8-device CPU topology before JAX initializes.

Multi-device (data-parallel / mesh) logic is tested without TPU hardware via
XLA's host-platform device-count override, per SURVEY.md §4.
"""

import os

# The axon TPU-tunnel plugin exports JAX_PLATFORMS=axon; tests must run on
# the virtual multi-device CPU topology, so force-override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the axon sitecustomize registers its PJRT
# plugin at interpreter startup and re-points jax_platforms. Overriding the
# config after import (but before backend init) pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
