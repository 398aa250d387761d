"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware.

Note: the session's sitecustomize registers a remote-TPU ('axon') PJRT
plugin and hard-sets ``jax_platforms='axon,cpu'`` via jax.config —
env vars alone cannot override it, so we update the config after import.
Running tests over the TPU tunnel would cost ~1s per eager op.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
