"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; see __graft_entry__.py)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Validation tests run in double precision (the reference is Float64
# throughout); production TPU runs use float32 — see utils/ftypes.py.
os.environ.setdefault("JAX_ENABLE_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
