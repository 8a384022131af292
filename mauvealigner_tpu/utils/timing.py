"""Per-phase wall-clock and throughput counters.

The reference's observability is a progress ticker (LogProgress,
src/mauveAligner.cpp:482,532); here profiling is first-class: every pipeline
phase records wall-clock and work counters, and DP phases report GCUPS
(giga cell updates per second).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self) -> None:
        self.phases: "OrderedDict[str, float]" = OrderedDict()
        self.counters: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def add(self, counter: str, value: float) -> None:
        self.counters[counter] = self.counters.get(counter, 0.0) + value

    def reset(self) -> None:
        self.phases.clear()
        self.counters.clear()

    def gcups(self, phase: str, cells_counter: str) -> Optional[float]:
        t = self.phases.get(phase)
        c = self.counters.get(cells_counter)
        if not t or c is None:
            return None
        return c / t / 1e9

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{'phase':<24}{'seconds':>10}{'share':>8}"]
        for name, t in self.phases.items():
            lines.append(f"{name:<24}{t:>10.3f}{t / total if total else 0:>8.1%}")
        lines.append(f"{'total':<24}{total:>10.3f}")
        for c, v in sorted(self.counters.items()):
            lines.append(f"{c}: {v:,.0f}")
        g = self.gcups("gapped_closure", "dp_cells")
        if g is not None:
            lines.append(f"gapped DP throughput: {g:.3f} GCUPS")
        return "\n".join(lines) + "\n"


# process-global default timer (cheap; aligners use it when none is given)
GLOBAL = PhaseTimer()
