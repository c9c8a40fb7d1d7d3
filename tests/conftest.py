"""Test harness: force an 8-device virtual CPU mesh BEFORE importing jax so
multi-chip sharding tests run anywhere (SURVEY.md §4: pixel tiles are
embarrassingly parallel, so the sharded run must match single-chip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402,F401  (oracles are pure numpy; no x64 needed in jax)
