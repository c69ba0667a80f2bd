"""Test harness: force an 8-virtual-device CPU platform so multi-chip
sharding tests run anywhere (SURVEY.md §4).

Note: the env-var route (JAX_PLATFORMS=cpu) is overridden by preinstalled
platform plugins in some environments, so the platform is forced through
jax.config after import instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def dragon_path():
    return "/root/reference/DirectX-RayTracer/DirectX-RayTracer/Scenes/Dragon.crtscene"
