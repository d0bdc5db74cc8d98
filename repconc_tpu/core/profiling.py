"""Profiling helpers: jax.profiler traces + named step annotations.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars and shell
`tee` timestamps only). Here every trainer/search loop can be wrapped in an
XLA trace viewable in TensorBoard / Perfetto.

Usage:
    from repconc_tpu.core.profiling import trace, annotate

    with trace("/tmp/repconc_trace"):        # writes a profiler trace
        for step, batch in enumerate(batches):
            with annotate("train_step", step_num=step):
                state = train_step(state, batch)
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op if log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str, **kwargs):
    """Named region for the trace timeline (StepTraceAnnotation)."""
    return jax.profiler.StepTraceAnnotation(name, **kwargs)


class Stopwatch:
    """Wall-clock accumulator for host-side phase timing (encode/search/IO)."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0)

    def summary(self) -> dict:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
