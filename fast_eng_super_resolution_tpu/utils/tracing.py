"""Profiling hooks: structured spans + jax.profiler traces.

The reference's observability is ad-hoc prints (SURVEY §5 Tracing).  Here:
- ``trace_dir()`` context: captures a jax.profiler trace (TensorBoard format)
  for any code region when FESR_TRACE_DIR is set (no-op otherwise);
- ``annotate``: named TraceAnnotation visible in the trace timeline;
- re-exports utils.logging.span for wall-clock spans.
"""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext

from .logging import span  # noqa: F401  (re-export)


@contextmanager
def trace_dir(name: str = "trace"):
    """Captures a profiler trace into $FESR_TRACE_DIR/<name> when set."""
    base = os.environ.get("FESR_TRACE_DIR")
    if not base:
        yield
        return
    import jax

    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return nullcontext()
