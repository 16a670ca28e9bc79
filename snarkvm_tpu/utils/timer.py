"""Timer tracing — the aleo-std `timer!/lap!/finish!` analog (reference:
synthesizer timer feature, algorithms start_timer!/end_timer! in
varuna.rs:78,390). Enabled with SNARKVM_TPU_TIMER=1; zero-cost no-ops
otherwise. Laps print indented wall times to stderr and accumulate into
the metrics histograms for programmatic readout."""
from __future__ import annotations

import os
import sys
import time

_ENABLED = os.environ.get("SNARKVM_TPU_TIMER") == "1"
_depth = 0


class _Timer:
    __slots__ = ("name", "t0", "last")

    def __init__(self, name: str):
        self.name = name
        self.t0 = self.last = time.perf_counter()

    def lap(self, label: str) -> None:
        if not _ENABLED:
            return
        now = time.perf_counter()
        print(f"{'  ' * _depth}  {self.name}::{label}: "
              f"{(now - self.last) * 1e3:.1f} ms", file=sys.stderr)
        self.last = now

    def finish(self) -> None:
        global _depth
        if not _ENABLED:
            return
        total = time.perf_counter() - self.t0
        _depth = max(0, _depth - 1)
        print(f"{'  ' * _depth}{self.name}: {total * 1e3:.1f} ms total",
              file=sys.stderr)
        from . import metrics
        metrics.histogram(f"snarkvm_timer_{self.name}_ms", total * 1e3)


def timer(name: str) -> _Timer:
    global _depth
    if _ENABLED:
        print(f"{'  ' * _depth}{name}...", file=sys.stderr)
        _depth += 1
    return _Timer(name)


def enabled() -> bool:
    return _ENABLED
