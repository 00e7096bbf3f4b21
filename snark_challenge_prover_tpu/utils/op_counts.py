"""Field/curve operation counters — PROFILE_OP_COUNTS parity.

The reference counts every Fq add/sub/mul/sqr/inv and G1/G2 add/dbl at
runtime via static members (libff fp.hpp:46-52, mnt4753_g1.cpp:19-20,
printed by print_cumulative_op_counts).  Under XLA the graph executes
outside Python, so runtime increments are impossible — but trace-time
counting is *exact* provided loop trip counts are accounted for: every
op recorded while tracing runs once per execution, except ops inside
lax.scan / fori_loop bodies, which run `trip_count` times.  The compute
code wraps loop-body tracing in `loop_scope(trip_count)` so the
counters multiply correctly; the result equals what the reference's
runtime counters would report for the same algorithm.

Usage:
    with op_counts.counting() as c:
        jax.jit(fn).lower(*args)      # or just run fn under trace
    c.report()

Counting is off (zero overhead beyond a None-check) unless a counting()
scope is active.
"""

from __future__ import annotations

import contextlib
from collections import Counter
from dataclasses import dataclass, field


@dataclass
class OpCounter:
    counts: Counter = field(default_factory=Counter)
    _scale: int = 1

    def add(self, key: str, n: int = 1):
        self.counts[key] += n * self._scale

    def report(self) -> dict:
        return dict(sorted(self.counts.items()))

    def print_report(self):
        """print_cumulative_op_counts flavour (profiling.cpp)."""
        for k, v in sorted(self.counts.items()):
            print(f"  {k:>12}: {v}")


_active: OpCounter | None = None


def active() -> OpCounter | None:
    return _active


def record(key: str, n: int = 1) -> None:
    if _active is not None:
        _active.add(key, n)


@contextlib.contextmanager
def counting():
    """Enable op counting for the dynamic extent (trace your function
    inside this scope)."""
    global _active
    prev = _active
    _active = OpCounter()
    try:
        yield _active
    finally:
        _active = prev


@contextlib.contextmanager
def loop_scope(trip_count: int):
    """Ops traced inside count `trip_count` times (lax.scan/fori_loop
    bodies are traced once but executed trip_count times)."""
    global _active
    if _active is None:
        yield
        return
    old = _active._scale
    _active._scale = old * max(0, trip_count)
    try:
        yield
    finally:
        _active._scale = old
