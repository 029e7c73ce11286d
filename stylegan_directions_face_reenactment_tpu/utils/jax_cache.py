"""Persistent XLA compilation cache setup.

Under the tunneled TPU runtime, large-graph compiles are slow (the IR-SE-50
body alone takes minutes on first compile). Enabling JAX's persistent
compilation cache makes every subsequent process reuse compiled executables.
Call :func:`enable_persistent_cache` early (bench.py, CLI entry points and
the graft entry do this automatically).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get("REENACT_TPU_JIT_CACHE",
                                   os.path.expanduser("~/.cache/reenact_tpu_xla"))


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
