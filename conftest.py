"""Pytest configuration: run tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the same mechanism
the driver uses for dryrun_multichip).

Note: the environment's TPU plugin forces its own platform via
jax.config.update at interpreter startup (sitecustomize), so JAX_PLATFORMS
alone is not enough — we must re-update the config after importing jax and
before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this environment's XLA CPU client can abort
# inside backend_compile after heavy in-process compile churn (seen as
# "Fatal Python error: Aborted/Segmentation fault" in large compiles late in
# the suite). Cached executables skip backend_compile entirely, which both
# sidesteps the crash on warmed runs and cuts suite time substantially.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
