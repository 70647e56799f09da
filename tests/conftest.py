"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh, the TPU-world
answer to multi-node testing without a cluster (SURVEY.md §4).

Note: the axon TPU plugin in this image registers itself regardless of the
``JAX_PLATFORMS`` env var, so we must also override via ``jax.config``
after import (verified: env alone leaves default_backend == tpu).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("FGK_INTEGRAL_CACHE", "/tmp/fgk_integral_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
