"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU backend and pins
# JAX_PLATFORMS=axon; override it after import so tests always run on the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is XLA-compile-bound (every mesh/train-step test compiles a
# fresh GSPMD graph); the persistent cache makes warm runs ~4x faster.
from early_exit_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
