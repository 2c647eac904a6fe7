"""Test configuration: run JAX on CPU with 8 virtual devices so the full
pjit/sharding surface is exercised without TPU hardware (SURVEY.md §4)."""

import os

# The driver environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests must
# run on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Authoritative platform pin: the env var can be captured by jax.config before
# this conftest runs (plugin import order), so set the config value directly.
jax.config.update("jax_platforms", "cpu")

# f64 golden tests compare against the reference's float64 PCA math; the model
# itself runs f32/bf16 (explicit dtypes) so enabling x64 here is test-only.
jax.config.update("jax_enable_x64", True)
