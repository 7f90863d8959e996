"""Profiling hooks (SURVEY.md section 5: the reference has only
commented-out clock() instrumentation, QuicKmer.c:259-295; here the
standard JAX/XLA profiler is a first-class flag).

`trace(dir)` wraps a run in `jax.profiler.trace`, producing an xprof
trace directory (per-kernel device timing, host/device timelines,
HBM traffic) viewable with TensorBoard or xprof. `annotate(name)` adds
a named TraceAnnotation region so pipeline phases (tabulate / filter /
emit, stream / finish) are labeled in the timeline. Both are no-ops
when no trace directory is active, so the hot paths carry no cost by
default.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Profile the enclosed region into trace_dir (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named region for the profiler timeline (cheap; real annotation
    only materializes inside an active trace)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
