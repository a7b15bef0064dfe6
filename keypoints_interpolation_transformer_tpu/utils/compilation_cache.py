"""Persistent XLA compilation cache.

First TPU compiles are 20-40 s; entry points call this so repeat CLI /
bench invocations reuse compiled executables across processes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "KIT_TPU_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/kit_tpu_xla_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure
