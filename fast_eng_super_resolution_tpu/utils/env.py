"""Runtime environment setup: persistent XLA compilation cache.

First compiles of the training step are expensive (minutes on CPU for the
vmapped backward; 20-40 s on the TPU tunnel).  The persistent cache makes
every process after the first reuse compiled executables — tests, bench runs,
and CLI invocations all share it.
"""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None) -> None:
    import jax

    cache = path or os.environ.get(
        "FESR_COMPILE_CACHE", os.path.expanduser("~/.cache/fesr_tpu_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: non-fatal
