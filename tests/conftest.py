"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The axon TPU plugin in this image forces jax_platforms="axon,cpu"
programmatically (env vars are ignored), so we must override via
jax.config.update after import — before any computation runs.
"""

import os

# tests at sample_batch=1: the shipping default of 4 would make every
# volpath render test compile a 4x-lane wavefront on the single-core CPU
# host; test_jit_compat::test_sample_batch_matches_sequential covers K>1
os.environ.setdefault("HIKARI_SAMPLE_BATCH", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-dominated (fresh process
# recompiles every jit); XLA:CPU honors the cache, cutting reruns sharply
jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
