"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of a fake distributed backend (SURVEY.md §4): all
sharding/collective logic is exercised on CPU with
``--xla_force_host_platform_device_count=8``; kernels and models run the
same traced code they run on TPU.
"""
import os

# must be set before jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU tunnel backend and
# overrides JAX_PLATFORMS; win the fight via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

os.environ.setdefault("SEEVCN_NO_JAX_CACHE", "1")  # avoid cross-config CPU AOT reloads
