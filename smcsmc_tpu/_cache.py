"""Persistent XLA compilation cache: the sweep program is large (scan over a
masked while-loop over the whole particle population) and cold compiles cost
minutes; caching makes repeat CLI/bench invocations start in seconds."""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "SMCSMC_TPU_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
