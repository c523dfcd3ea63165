"""Test configuration: force an 8-device virtual CPU platform.

The reference's tests require one real GPU (SURVEY.md §4); ours instead run
everywhere by testing on the CPU backend with 8 virtual devices so that
multi-chip sharding paths are exercised without hardware — the environment
variables must be set before JAX is imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may set 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize imports jax before this file runs, freezing
# JAX_PLATFORMS=axon (real TPU over a tunnel) into jax.config — override
# through the config API as well so tests always run on the virtual
# 8-device CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
