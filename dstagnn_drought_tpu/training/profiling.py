"""Tracing/profiling subsystem.

The reference has no profiler at all — its closest instrumentation is an
``xm.get_memory_info`` print every 100 batches and an epoch wall-time print
(reference train_DSTAGNN_my.py:152-153,174). Here profiling is first-class
(SURVEY.md §5):

* ``trace(logdir)`` — XLA-level device trace via ``jax.profiler`` viewable in
  TensorBoard/Perfetto; wraps any region (an epoch, a step, a bench run).
* ``StepTimer`` — async-dispatch-aware wall timing: the fence
  (``block_until_ready``) happens only at interval edges so the hot loop is
  never host-synced per step (the reference's per-batch ``loss.item()`` sync
  is the anti-pattern this replaces).
* ``throughput`` — derived counters for the benchmark table: windows/s and
  edges/s/chip, where an "edge" is one aggregated (src→dst, order k,
  timestep) contribution: nnz(A) · K · T · B per step.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2):
    """Device+host trace of the enclosed region, written for TensorBoard.

    Usage::

        with trace("/tmp/jaxtrace"):
            params, ... = epoch_runner(...)
            jax.block_until_ready(params)
    """
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=opts)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # named host-side trace regions
annotate_function = jax.profiler.annotate_function


@dataclasses.dataclass
class StepTimer:
    """Wall-clock step timing with explicit fence points.

    ``tick()`` marks a step boundary without syncing; ``fence(x)`` blocks on
    ``x`` and closes the open interval. Mean step time excludes compile
    (the first fenced interval can be dropped with ``drop_first``).
    """

    drop_first: bool = True
    _marks: list = dataclasses.field(default_factory=list)
    _t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def fence(self, x, steps: int = 1):
        """Block on device value ``x``; record elapsed/steps as one sample."""
        jax.block_until_ready(x)
        now = time.perf_counter()
        if self._t0 is not None:
            self._marks.append((now - self._t0) / steps)
        self._t0 = now

    @property
    def samples(self) -> list[float]:
        return self._marks[1:] if self.drop_first and len(self._marks) > 1 else self._marks

    def mean_step_seconds(self) -> float:
        s = self.samples
        return sum(s) / len(s) if s else float("nan")


def throughput(
    *,
    step_seconds: float,
    batch_size: int,
    nnz: int,
    K: int,
    T: int,
    n_chips: int = 1,
) -> dict:
    """Benchmark counters from a measured step time.

    edges/s/chip counts aggregated (src→dst, order, timestep) contributions:
    nnz · K · T · batch per step (SURVEY.md §5 tracing row).
    """
    windows_per_s = batch_size / step_seconds
    edges_per_step = nnz * K * T * batch_size
    return {
        "step_seconds": step_seconds,
        "windows_per_s": windows_per_s,
        "edges_per_s_per_chip": edges_per_step / step_seconds / n_chips,
    }
