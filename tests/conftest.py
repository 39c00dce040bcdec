"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; tests validate numerics and
multi-chip sharding on host devices, mirroring the reference's strategy of
testing GPU compilation without a GPU (tests/test_gpu.nim:21-34).

NOTE: this environment registers an always-on TPU-tunnel platform ("axon")
that ignores the JAX_PLATFORMS env var, so the CPU override must go through
jax.config *before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
