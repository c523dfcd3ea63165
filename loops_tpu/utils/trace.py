"""Tracing / profiling helpers.

The reference's observability is device-event timers + NVBench/CUPTI
counters (SURVEY.md §5). The TPU equivalents: the JAX profiler for
hardware traces, chained timers for wall numbers, and the CSV row
contract the examples print (``kernel,dataset,rows,cols,nnzs,elapsed``).
"""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile(logdir: str = "/tmp/loops_tpu_trace"):
    """Capture a JAX profiler trace viewable in TensorBoard/XProf."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces (decorator/context)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def csv_row(kernel: str, dataset: str, rows: int, cols: int, nnz: int,
            elapsed_ms: float, **extra) -> str:
    """The sweep-log CSV contract (reference:
    examples/spmv/thread_mapped.cu:42-44)."""
    base = f"{kernel},{dataset},{rows},{cols},{nnz},{elapsed_ms:.5f}"
    if extra:
        base += "," + ",".join(str(v) for v in extra.values())
    return base
