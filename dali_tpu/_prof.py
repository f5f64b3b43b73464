"""Host-time itemization (reference ExecutorMetaMap / nvtx DomainTimeRange).

Accumulates wall-time per named section of the host stage so
``executor_statistics()`` can attribute host time (decode / pack / staging /
window-sampling / dispatch) instead of reporting one opaque
``host_phase_seconds``. All sections run on the single host-stage thread, so
plain dict accumulation is safe; the overhead is one perf_counter pair per
section (~100 ns), negligible against the >100 µs sections it wraps.

Enable-once design: sections always accumulate (they are cheap); ``snapshot``
returns a copy, ``reset`` clears between measurement windows.
"""

from __future__ import annotations

import time
from typing import Dict

_acc: Dict[str, float] = {}
_cnt: Dict[str, int] = {}


class section:
    """Context manager accumulating elapsed seconds under ``name``.

    Also accumulates this THREAD's cpu seconds under ``name#cpu``
    (CLOCK_THREAD_CPUTIME_ID): sections that release the GIL (native batch
    calls) can lose wall time to OTHER stage threads competing for cores —
    wall−cpu is exactly that theft, which on a 1-core host is the difference
    between the in-pipeline decode cost and the microbench's (the r3 verdict's
    "unexplained 80 µs/img").
    """

    __slots__ = ("name", "t0", "c0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.c0 = time.thread_time()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        dc = time.thread_time() - self.c0
        _acc[self.name] = _acc.get(self.name, 0.0) + dt
        _cnt[self.name] = _cnt.get(self.name, 0) + 1
        k = self.name + "#cpu"
        _acc[k] = _acc.get(k, 0.0) + dc
        return False


def add(name: str, seconds: float):
    _acc[name] = _acc.get(name, 0.0) + seconds
    _cnt[name] = _cnt.get(name, 0) + 1


def snapshot() -> Dict[str, float]:
    return dict(_acc)


def counts() -> Dict[str, int]:
    return dict(_cnt)


def reset():
    _acc.clear()
    _cnt.clear()
