"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual XLA devices so that sharding /
multi-chip code paths are exercised without TPU hardware — the standard
no-cluster multi-host harness (SURVEY.md §4).  Must run before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the env ships JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# sets jax_platforms="axon,cpu" programmatically (env vars are ignored);
# override it here, before any backend initializes.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the suite is compile-bound on CPU; cached
# executables make repeat runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/vslam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
