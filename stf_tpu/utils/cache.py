"""Persistent XLA compilation cache.

Full-size model compiles cost minutes through the remote-compile tunnel;
caching them on disk makes repeat CLI/bench invocations start warm. Safe to
call unconditionally — if the backend ignores the cache it's a no-op.
"""

import os


def enable_compile_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "STF_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
