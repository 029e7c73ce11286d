"""Persistent XLA compilation cache setup.

Under the tunneled TPU runtime, large-graph compiles are slow (the IR-SE-50
body alone takes minutes on first compile). Enabling JAX's persistent
compilation cache makes every subsequent process reuse compiled executables.
Call :func:`enable_persistent_cache` early (bench.py, CLI entry points and
the graft entry do this automatically).

The cache directory is keyed by the host CPU's feature flags: XLA:CPU AOT
artifacts embed the compile machine's features and loading them on a
different host warns "could lead to execution errors such as SIGILL"
(cpu_aot_loader.cc) — a shared $HOME across heterogeneous machines must not
share CPU executables. TPU artifacts are target-keyed already, but the
per-machine directory is cheap insurance for both.
"""

from __future__ import annotations

import hashlib
import os


def _machine_tag() -> str:
    """Short hash of the host CPU's feature flags (Linux)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine() or "generic"


DEFAULT_CACHE_DIR = os.environ.get(
    "REENACT_TPU_JIT_CACHE",
    os.path.expanduser(f"~/.cache/reenact_tpu_xla-{_machine_tag()}"))


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
