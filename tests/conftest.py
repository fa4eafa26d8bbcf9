"""Test configuration: force CPU backend with 8 virtual devices.

This is the standard JAX substitute for multi-device tests without a pod
(SURVEY.md §4): shardings compile and execute against 8 host-platform devices.

Note: this image registers a remote-TPU ("axon") PJRT plugin via sitecustomize
and sets JAX_PLATFORMS=axon globally, so jax may already be imported by the
time this conftest runs. We therefore override both the env var AND the live
jax config; tests then run on fast local CPU instead of the TPU tunnel.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache keeps repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
