"""Wall-clock stopwatches (TimeCost, common/timecost.h:29-77) + jax profiler
hooks. The per-stage costs feed statistics.txt columns 10-12."""

import contextlib
import time


class TimeCost:
    def __init__(self):
        self.restart()

    def restart(self):
        self._t0 = time.perf_counter()

    def cost_ms(self):
        return (time.perf_counter() - self._t0) * 1000.0

    def cost_s(self):
        return time.perf_counter() - self._t0


@contextlib.contextmanager
def profile_trace(logdir):
    """jax.profiler trace context — the TPU-native tracing subsystem
    (SURVEY.md §5.1). Usage: with profile_trace('/tmp/trace'): step()."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
