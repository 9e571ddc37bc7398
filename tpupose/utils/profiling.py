"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5: the only timing
artifact is an unused ``import time`` at ``pose_detector.py:3``).  This
module adds the TPU-native observability layer:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  TensorBoard/XProf traces of device execution;
* ``StageTimer`` — lightweight named wall-clock timers with block-until-
  ready semantics for honest device timings;
* ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` passthrough so
  pipeline stages show up as named spans in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace into ``logdir`` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name.

    ``block=True`` (default) forces a real sync on the stage result
    (``jax.device_get`` — on remote-device links ``block_until_ready`` can
    return before the work completes, silently attributing device time to
    the next stage) so device work lands in the right stage.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block: bool = True):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if block and "result" in out:
                jax.device_get(out["result"])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / self.counts[name],
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'stage':<24s} {'count':>6s} {'mean ms':>10s} "
                 f"{'total s':>9s}"]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:<24s} {s['count']:>6d} "
                         f"{s['mean_ms']:>10.2f} {s['total_s']:>9.3f}")
        return "\n".join(lines)
