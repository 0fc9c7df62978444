"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on XLA's host platform with 8 virtual devices, per the project test strategy
(SURVEY.md §4). The environment may pre-register a TPU platform plugin from
``sitecustomize`` (which already imported jax), so the platform must be forced
through ``jax.config`` — env vars alone are too late.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of the full models dominate test
# time; cache them across runs (repo-local, gitignored).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
