"""Tracing / profiling utilities (SURVEY §5: the reference has none beyond a
progress bar; the TPU build adds JAX profiler traces + per-step timing).

Usage:
    from nbdt_tpu.profiling import trace, StepTimer, annotate_step

    with trace("/tmp/nbdt-trace"):         # Perfetto/TensorBoard trace dir
        for step, batch in enumerate(loader):
            with annotate_step("train", step):
                train_step(...)

    timer = StepTimer()
    ...
    timer.tick()                           # per-step wall times
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a JAX profiler trace into ``log_dir`` (viewable in
    TensorBoard's profile plugin or ui.perfetto.dev)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_step(name: str, step: Optional[int] = None):
    """Mark a training step in the trace timeline (XLA ops dispatched inside
    are grouped under this annotation in the profile)."""
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class StepTimer:
    """Light per-step wall-clock accumulator (host-side; measures dispatch +
    sync time of whatever the caller blocks on between ticks)."""

    def __init__(self):
        self._last = None
        self.times = []

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        if self._last is not None:
            self.times.append(dt)
        self._last = now
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            # nearest-rank percentile: ceil(0.9n)-1 (int(n*0.9) indexes the
            # MAX for n <= 10, reporting tail outliers as the p90)
            "p90_s": ts[max(0, -(-9 * n // 10) - 1)],
            "max_s": ts[-1],
        }
