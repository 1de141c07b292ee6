"""Profiling helpers (SURVEY §5 'Tracing': the reference has wall-clock-only
timing; the TPU equivalent is jax.profiler traces + the timing utils)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(out_dir: str | None):
    """Context manager: capture a jax.profiler trace into ``out_dir`` (view
    with TensorBoard / xprof).  No-op when out_dir is falsy."""
    if not out_dir:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield
