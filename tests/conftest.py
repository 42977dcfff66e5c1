"""Test configuration: run JAX on CPU with float64 and 8 virtual devices.

The sharding tests exercise the multi-chip path on a virtual 8-device CPU
mesh (the same mechanism the driver's ``dryrun_multichip`` uses); numerics
tests need float64 to verify entropy conservation to ~1e-12.
"""

import os

# force CPU even when the environment pins JAX_PLATFORMS to a TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin (sitecustomize) pins jax_platforms via
# jax.config.update, which overrides the env var — override it back.
jax.config.update("jax_platforms", "cpu")
