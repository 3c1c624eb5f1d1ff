"""Benchmark context manager combining timers and memory probes
(reference lib/stnls/utils/bench.py RecordIt, used by bench/search.py)."""

from contextlib import contextmanager

from stnls_tpu.utils.timer import ExpTimer, ExpTimerList, sync
from stnls_tpu.utils.mem import GpuRecord


class RecordIt:

    def __init__(self, use_record=True):
        self.use_record = use_record
        self.timers = ExpTimerList(use_record)
        self.mems = GpuRecord(use_record)

    @contextmanager
    def __call__(self, name):
        timer = ExpTimer(self.use_record)
        timer.sync_start(name)
        try:
            yield self
        finally:
            timer.sync_stop(name)
            self.timers.update_times(timer)
            self.mems.snap(name)

    def summary(self):
        return {"times": dict(self.timers.times),
                "mems": dict(self.mems.mems)}

    def __str__(self):
        return f"times={self.timers} mems={self.mems}"
