"""Test configuration: CPU backend, 8 virtual devices for sharding tests, x64.

Note: this environment registers a TPU PJRT plugin from sitecustomize, so
JAX_PLATFORMS env vars set at interpreter runtime are ineffective; the
config update below is the reliable way to pin tests to (virtual) CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
