"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on a virtual
CPU mesh (xla_force_host_platform_device_count).  Note: this environment's
sitecustomize force-registers the axon TPU platform and overrides the
JAX_PLATFORMS env var, so the platform must be pinned through jax.config
*before* any backend is initialised.
"""

import os

# Default mappers to the segmented wire: the rayflow (full-ray) path is a
# compile-time-heavy program per batch shape and is covered by dedicated
# differential tests that opt in with rayflow=True.
os.environ.setdefault("OHM_RAYFLOW", "0")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
