"""Test harness: run everything on a virtual 8-device CPU mesh.

This gives real pjit/collective semantics without TPU hardware (SURVEY.md §4).
Note: under the axon TPU plugin the JAX_PLATFORMS env var is not honored, so
the platform is forced via jax.config before the backend initializes. Matmul
precision is pinned to float32 so torch-parity tests compare like for like
(the production hot path uses explicit bfloat16 compute dtypes instead of
relying on default matmul precision).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
