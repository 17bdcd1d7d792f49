"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests run on the CPU backend for determinism and so that multi-device
sharding tests can fake an 8-device mesh on one host (the standard JAX
trick; SURVEY.md §4). Must run before jax initializes.
"""

import os

# force CPU even when the shell presets JAX_PLATFORMS (e.g. a TPU platform):
# tests must be hermetic, deterministic, and able to fake an 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# a sitecustomize may have imported jax before this file ran, in which case
# the env var was already latched — override through the config API too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
