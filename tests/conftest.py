"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on fake CPU devices
(`--xla_force_host_platform_device_count=8`); real-TPU benchmarking happens
in bench.py, not in the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: XLA CPU compiles are slow on this small host and
# the test suite re-traces the same kernels every run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

# The environment's sitecustomize registers a remote-TPU PJRT plugin for
# every interpreter and pins JAX_PLATFORMS=axon; without this override the
# test suite silently dispatches op-by-op over the TPU tunnel (each tiny op
# a network roundtrip — 100x slowdown). Tests must run on local CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
