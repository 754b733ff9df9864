"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

The sandbox presets JAX_PLATFORMS=axon (the real TPU tunnel) and pre-imports
jax via a sitecustomize hook, so plain env-var edits here are too late; we
override through jax.config instead. Tests always run on CPU so they are fast,
deterministic, and can use f64 oracles; `bench.py` and `__graft_entry__.py`
use the real device.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent jit cache: most suite time is XLA:CPU compiles of the same tiny
# nets/solvers; caching them makes repeat runs (the common case while
# developing) far faster. Safe to delete the dir at any time.
jax.config.update("jax_compilation_cache_dir", "/tmp/suo_slam_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Fast tier is compile-bound (single CPU): skip most XLA optimization passes
# there. The SLOW tier (and `-m ""` full runs) keeps DEFAULT optimizations so
# fusion/fast-math-sensitive behaviors (optimization_barrier placement, int8
# round ties, readout numerics) are exercised under the production compiler
# mode at least once per CI cycle. Override either way with SUO_FULL_OPT=0/1.


def pytest_configure(config):
    env = os.environ.get("SUO_FULL_OPT")
    if env is not None:
        full_opt = env == "1"
    else:
        # default fast tier runs with `-m "not slow"` (pytest.ini addopts);
        # anything that includes slow tests gets the production compiler
        full_opt = config.getoption("-m") != "not slow"
    jax.config.update("jax_disable_most_optimizations", not full_opt)
