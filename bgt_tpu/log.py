"""Logging, verbosity, and stage timing.

The reference's observability is stderr diagnostics gated by verbosity ints
(hts_verbose / fmf_verbose) plus the n_gt_read work meter.  Here:

- ``verbosity()`` (env ``BGT_TPU_VERBOSE``, default 3) gates warnings the
  same way;
- ``stage(name)`` context-manages wall-time logging of pipeline stages at
  verbosity >= 4;
- ``BGT_TPU_TRACE=<dir>`` wraps query execution in a ``jax.profiler`` trace
  so device kernels show up in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_verbose = None


def verbosity() -> int:
    global _verbose
    if _verbose is None:
        try:
            _verbose = int(os.environ.get("BGT_TPU_VERBOSE", "3"))
        except ValueError:
            _verbose = 3
    return _verbose


def set_verbosity(v: int) -> None:
    global _verbose
    _verbose = v


def warn(func: str, msg: str) -> None:
    if verbosity() >= 2:
        print(f"[W::{func}] {msg}", file=sys.stderr)


def info(func: str, msg: str) -> None:
    if verbosity() >= 3:
        print(f"[M::{func}] {msg}", file=sys.stderr)


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage; logged at verbosity >= 4."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if verbosity() >= 4:
            dt = time.perf_counter() - t0
            print(f"[T::{name}] {dt * 1000:.2f} ms", file=sys.stderr)


@contextlib.contextmanager
def device_trace():
    """jax.profiler trace around a query when BGT_TPU_TRACE is set."""
    trace_dir = os.environ.get("BGT_TPU_TRACE")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
