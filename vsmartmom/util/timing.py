"""Stage timing reports (the reference instruments every stage with
TimerOutputs @timeit and prints a report after rt_run;
ref: src/CoreRT/rt_run.jl:87-220, tools/gpu_batched.jl:39-41).

Usage:
    with timeit("doubling"):
        ...
    print_timer()      # hierarchical-ish flat report
    reset_timer()

Enabled by default; disable globally with VSMARTMOM_TIMING=0 (zero
overhead beyond two perf_counter calls per block).
"""
from __future__ import annotations

import os
import time
from collections import OrderedDict
from contextlib import contextmanager

_ENABLED = os.environ.get("VSMARTMOM_TIMING", "1") != "0"
_STATS: "OrderedDict[str, list]" = OrderedDict()


@contextmanager
def timeit(name: str):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        ent = _STATS.setdefault(name, [0, 0.0, 0.0])
        ent[0] += 1
        ent[1] += dt
        ent[2] = max(ent[2], dt)


def reset_timer():
    _STATS.clear()


def timer_report() -> str:
    if not _STATS:
        return "(no timing data)"
    width = max((len(k) for k in _STATS), default=4) + 2
    lines = [f"{'stage':<{width}}{'calls':>7}{'total[s]':>11}"
             f"{'mean[ms]':>11}{'max[ms]':>10}"]
    for k, (n, tot, mx) in _STATS.items():
        lines.append(f"{k:<{width}}{n:>7}{tot:>11.3f}"
                     f"{1e3 * tot / n:>11.2f}{1e3 * mx:>10.2f}")
    return "\n".join(lines)


def print_timer():
    print(timer_report())
