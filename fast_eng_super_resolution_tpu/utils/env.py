"""Runtime environment setup: persistent XLA compilation cache.

First compiles of the training step are expensive (minutes on CPU for the
vmapped backward; 20-40 s on the TPU tunnel).  The persistent cache makes
every process after the first reuse compiled executables — tests, bench runs,
and CLI invocations all share it.
"""

from __future__ import annotations

import os


def maybe_init_distributed() -> bool:
    """Env-gated multi-host bring-up: ``FESR_MULTIHOST=1`` calls
    ``jax.distributed.initialize`` before any backend touch.

    The reference's analog is the NCCL rendezvous hardcoded to
    localhost:12355 (scheduler_gnn.py:316-318, 352-354); here the JAX runtime
    owns rendezvous and the mesh is built over the global ``jax.devices()``
    (SURVEY §2.2: ICI within a slice, DCN across hosts).  Configuration via
    the standard JAX env vars or their FESR_* overrides:

      FESR_COORDINATOR   coordinator address host:port
      FESR_NUM_PROCESSES total process count
      FESR_PROCESS_ID    this process's rank

    On managed TPU pods all three are auto-detected and initialize() can be
    called with no arguments.  Returns True when initialization ran.
    """
    if os.environ.get("FESR_MULTIHOST") != "1":
        return False
    import jax

    kwargs = {}
    if os.environ.get("FESR_COORDINATOR"):
        kwargs["coordinator_address"] = os.environ["FESR_COORDINATOR"]
    if os.environ.get("FESR_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["FESR_NUM_PROCESSES"])
    if os.environ.get("FESR_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["FESR_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


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
