"""Persistent XLA compilation cache setup (compiles are expensive on TPU)."""

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax
    path = path or os.environ.get(
        "LART_COMPILE_CACHE", os.path.expanduser("~/.cache/lart_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
