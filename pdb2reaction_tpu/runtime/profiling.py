"""Profiling + observability hooks.

The reference's tracing is wall-clock prints only (SURVEY.md §5.1:
``format_elapsed`` per stage, no profiler). Here:

- ``trace(dir)``: context manager around any workflow that captures a
  jax.profiler trace (TensorBoard-compatible) — every CLI command accepts
  ``--profile DIR``;
- ``ForceCallMeter``: per-phase force-call counters layered on the
  calculator's global counter (the BASELINE metric is force-calls/sec,
  BASELINE.md), with a report table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(str(log_dir)):
        yield
    print(f"[profile] jax.profiler trace written to {log_dir}")


class ForceCallMeter:
    """Per-phase force-call and wall-clock accounting."""

    def __init__(self, calc):
        self.calc = calc
        self.phases: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        start_calls = self.calc.force_calls
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            calls = self.calc.force_calls - start_calls
            acc = self.phases.setdefault(name, {"calls": 0, "seconds": 0.0})
            acc["calls"] += calls
            acc["seconds"] += dt

    def report(self) -> str:
        lines = [f"{'phase':<24}{'force calls':>12}{'seconds':>10}"
                 f"{'calls/s':>10}"]
        for name, acc in self.phases.items():
            rate = acc["calls"] / acc["seconds"] if acc["seconds"] else 0.0
            lines.append(f"{name:<24}{acc['calls']:>12}"
                         f"{acc['seconds']:>10.2f}{rate:>10.1f}")
        total_c = sum(a["calls"] for a in self.phases.values())
        total_s = sum(a["seconds"] for a in self.phases.values())
        lines.append(f"{'TOTAL':<24}{total_c:>12}{total_s:>10.2f}"
                     f"{(total_c / total_s if total_s else 0):>10.1f}")
        return "\n".join(lines)
