"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on a virtual
CPU mesh (xla_force_host_platform_device_count).  Must run before any jax
import, hence the env mutation at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
