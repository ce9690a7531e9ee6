"""Test configuration: run the whole suite on CPU with 8 virtual devices.

This is the standard fake-cluster technique for testing pjit/shard_map code without a
TPU slice (SURVEY.md §4): XLA exposes 8 host-CPU devices so mesh/sharding tests exercise
real collectives.

Note: the axon TPU shim in this environment captures JAX_PLATFORMS at interpreter start,
so mutating os.environ here is not enough — we must force the platform through
jax.config after import (before any backend is initialized).  Override with
VUB_TEST_PLATFORM=axon to run the suite on real TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("VUB_TEST_PLATFORM", "cpu"))
