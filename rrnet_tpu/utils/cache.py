"""Persistent XLA compilation cache — first compile of the big models
through the remote-compile path costs minutes; cache it under the repo."""

import os


def enable_compilation_cache(path: str | None = None):
    import jax
    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
