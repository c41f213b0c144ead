"""Profiling helpers: jax.profiler traces around pipeline stages.

Replaces the reference's wall-clock prints (``GUIPanel.py:193,215-216``) with
real device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace around the wrapped block."""
    log_dir = log_dir or os.environ.get("SCULPTMATE_TRACE_DIR", "/tmp/sculptmate_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for stage labelling inside a trace."""
    return jax.profiler.TraceAnnotation(name)
