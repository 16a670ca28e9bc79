"""Metrics facade — the TPU build's analog of the `metrics/` crate
(reference: metrics/src/lib.rs, a 105-line counter/gauge/histogram facade
over the `metrics` crate's global recorder).

The Python-native recorder is an in-process registry with a snapshot API;
exporters (Prometheus text format via `render_prometheus`) read from it.
Like the reference, recording is a no-op cheap call so call sites can be
left in hot paths unconditionally.
"""
from __future__ import annotations

import threading
from collections import defaultdict

# metric names (reference: metrics/src/lib.rs GAUGE_NAMES)
COMMITTEE_TOTAL_STAKE = "snarkvm_ledger_committee_total_stake"

GAUGE_NAMES = [COMMITTEE_TOTAL_STAKE]

_lock = threading.Lock()
_counters: dict[str, int] = defaultdict(int)
_gauges: dict[str, float] = {}
_histograms: dict[str, list] = defaultdict(list)


def register_metrics() -> None:
    for name in GAUGE_NAMES:
        register_gauge(name)


# ---- counters -------------------------------------------------------------

def register_counter(name: str) -> None:
    with _lock:
        _counters.setdefault(name, 0)


def counter(name: str, value: int) -> None:
    """Set the counter to an absolute value (lib.rs `counter`)."""
    with _lock:
        _counters[name] = int(value)


def increment_counter(name: str) -> None:
    with _lock:
        _counters[name] += 1


# ---- gauges ---------------------------------------------------------------

def register_gauge(name: str) -> None:
    with _lock:
        _gauges.setdefault(name, 0.0)


def gauge(name: str, value: float) -> None:
    with _lock:
        _gauges[name] = float(value)


def increment_gauge(name: str, value: float) -> None:
    with _lock:
        _gauges[name] = _gauges.get(name, 0.0) + float(value)


def decrement_gauge(name: str, value: float) -> None:
    with _lock:
        _gauges[name] = _gauges.get(name, 0.0) - float(value)


# ---- histograms -----------------------------------------------------------

def register_histogram(name: str) -> None:
    with _lock:
        _histograms.setdefault(name, [])


def histogram(name: str, value: float) -> None:
    with _lock:
        _histograms[name].append(float(value))


def histogram_label(name: str, label_key: str, label_value: str,
                    value: float) -> None:
    """lib.rs `histogram_label` — one labeled histogram sample."""
    histogram(f'{name}{{{label_key}="{label_value}"}}', value)


# ---- readout --------------------------------------------------------------

def snapshot() -> dict:
    with _lock:
        return {
            "counters": dict(_counters),
            "gauges": dict(_gauges),
            "histograms": {k: list(v) for k, v in _histograms.items()},
        }


def render_prometheus() -> str:
    snap = snapshot()
    lines = []
    for k, v in sorted(snap["counters"].items()):
        lines.append(f"# TYPE {k} counter\n{k} {v}")
    for k, v in sorted(snap["gauges"].items()):
        lines.append(f"# TYPE {k} gauge\n{k} {v}")
    for k, vs in sorted(snap["histograms"].items()):
        base = k.split("{")[0]
        lines.append(f"# TYPE {base} histogram")
        lines.append(f"{base}_count {len(vs)}")
        lines.append(f"{base}_sum {sum(vs)}")
    return "\n".join(lines) + ("\n" if lines else "")


def reset() -> None:
    """Test helper: clear all recorded metrics."""
    with _lock:
        _counters.clear()
        _gauges.clear()
        _histograms.clear()
