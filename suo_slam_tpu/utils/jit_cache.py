"""Persistent XLA compilation cache for the CLIs.

The flagship programs (int8 executor, engine kernels, BA buckets) cost
20-40 s each to compile on a cold process — a SLAM evaluation run compiles
a dozen of them before the first frame. XLA's persistent compilation cache
makes every later process start warm, so `evaluate.py` / `train.py` /
`calibrate_int8.py` enable it by default.

Env override: SUO_JIT_CACHE=<dir> relocates the cache, SUO_JIT_CACHE=0
disables it. Safe to delete the directory at any time.
"""

import os


def enable_jit_cache(path: str | None = None) -> str | None:
    """Turn on the persistent compilation cache; returns the dir (or None
    when disabled). Call before the first jitted computation."""
    import jax

    path = path or os.environ.get("SUO_JIT_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "suo_slam_tpu", "jit"
    )
    if path in ("0", "off", "none"):
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # skip trivial programs: caching them costs more than recompiling
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
