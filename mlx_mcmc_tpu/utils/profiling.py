"""Profiling helpers (SURVEY.md §5.1: the reference has only ad-hoc
``time.time()`` calls in examples; gradient counts are estimated with a
hardcoded constant, examples/06:170-171).

Here: ``trace_to`` wraps ``jax.profiler`` for XProf traces, and
``gradient_evals`` reads the *exact* per-draw leapfrog counts the kernels
record in ``TransitionInfo.num_integration_steps``.
"""

from __future__ import annotations

import contextlib

import numpy as np


@contextlib.contextmanager
def trace_to(log_dir: str, with_host: bool = False):
    """Capture a jax.profiler trace of the enclosed block (view with XProf /
    TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
    if with_host:  # pragma: no cover - cosmetic
        print(f"profiler trace written to {log_dir}")


def gradient_evals(info) -> int:
    """Total gradient (leapfrog) evaluations recorded by a run's
    TransitionInfo — exact, not estimated."""
    return int(np.asarray(info.num_integration_steps).sum())
