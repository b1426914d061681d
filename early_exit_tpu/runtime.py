"""Runtime environment helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — compiles on the axon-relayed
    TPU take minutes per new graph shape, so every entry point enables
    the on-disk cache (safe to call multiple times)."""
    import jax
    if path is None:
        path = os.environ.get(
            "EET_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "eet_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
