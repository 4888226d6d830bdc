"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; see __graft_entry__.py)."""

import os
import sys

# Force CPU (the ambient environment points JAX at a TPU tunnel, and jax is
# pre-imported by sitecustomize, so plain env vars are too late — use the
# config API before any backend is initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Validation tests run in double precision (the reference is Float64
# throughout); production TPU runs use float32 — see utils/ftypes.py.
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
