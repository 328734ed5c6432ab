"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere.
"""

import os

# NOTE: in this environment a sitecustomize registers an "axon" TPU backend and
# forces jax_platforms="axon,cpu", overriding the JAX_PLATFORMS env var. The
# config.update below (after import) is what actually pins tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
