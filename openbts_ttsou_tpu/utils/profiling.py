"""Profiling hooks (SURVEY §5: the reference has none beyond logging;
the TPU build exposes the JAX profiler).

Usage:
    with profiling.trace("/tmp/trace"):      # XPlane trace for
        run_hot_path()                        # TensorBoard/xprof

or set OPENBTS_TPU_TRACE=<dir> and call `maybe_trace()` around a
region (bench.py does this for the timed section).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler.trace wrapper that tolerates backends without
    profiler support (the axon relay)."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:  # profiler unsupported: run untraced
        yield


@contextlib.contextmanager
def maybe_trace(env: str = "OPENBTS_TPU_TRACE") -> Iterator[None]:
    log_dir = os.environ.get(env)
    if not log_dir:
        yield
        return
    with trace(log_dir):
        yield


def annotate(name: str):
    """TraceAnnotation for host-side phases (no-op without profiler)."""
    import jax

    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
