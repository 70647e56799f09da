"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh, the TPU-world
answer to multi-node testing without a cluster (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("FGK_INTEGRAL_CACHE", "/tmp/fgk_integral_cache")
