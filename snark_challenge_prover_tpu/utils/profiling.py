"""Nested block profiler + op counters.

Capability parity with libff's profiler (depends/libff/libff/common/
profiling.cpp:241-327): enter_block/leave_block print live START/DONE
lines with nested indentation, accumulate per-block cumulative times and
invocation counts, and print_cumulative_times reports them.  Op counting
(PROFILE_OP_COUNTS, fp.hpp:46-52) is replaced by a static op-count model:
on TPU every field op inside jit is fused, so we count at the algorithm
level instead of instrumenting the arithmetic.
"""

from __future__ import annotations

import collections
import contextlib
import os
import sys
import time

_indent = 0
_starts: dict[str, list] = {}
_cumulative = collections.Counter()
_counts = collections.Counter()
_enabled = os.environ.get("SNARK_TPU_PROFILE", "1") != "0"
_t0 = time.perf_counter()


def start_profiling():
    global _t0
    _t0 = time.perf_counter()
    _cumulative.clear()
    _counts.clear()


def enter_block(name: str, verbose: bool = True):
    global _indent
    if not _enabled:
        return
    _starts.setdefault(name, []).append(time.perf_counter())
    if verbose:
        print(f"{'  ' * _indent}(enter) {name}\t[t={time.perf_counter() - _t0:.4f}s]")
        sys.stdout.flush()
    _indent += 1


def leave_block(name: str, verbose: bool = True):
    global _indent
    if not _enabled:
        return
    _indent = max(0, _indent - 1)
    t1 = time.perf_counter()
    t0 = _starts.get(name, [t1]).pop() if _starts.get(name) else t1
    dt = t1 - t0
    _cumulative[name] += dt
    _counts[name] += 1
    if verbose:
        print(f"{'  ' * _indent}(leave) {name}\t[{dt:.4f}s x{_counts[name]}]")
        sys.stdout.flush()


@contextlib.contextmanager
def block(name: str, verbose: bool = True):
    enter_block(name, verbose)
    try:
        yield
    finally:
        leave_block(name, verbose)


def print_cumulative_times():
    print("Cumulative times:")
    for name, t in sorted(_cumulative.items(), key=lambda kv: -kv[1]):
        print(f"  {name}: {t:.4f}s ({_counts[name]}x)")


# ---------------------------------------------------------------------------
# static op-count model (PROFILE_OP_COUNTS analogue)
# ---------------------------------------------------------------------------
def msm_op_counts(n: int, c: int, windows: int, curve_muls_per_add: int = 22):
    """Predicted field-mul count of one MSM: segmented scan ~2N combines,
    triangle ~2*2^c, Horner c doublings, per window."""
    per_window = 2 * n + 2 * (1 << c)
    adds = windows * per_window + windows * c
    return {"group_adds": adds, "field_muls": adds * curve_muls_per_add}


def fft_op_counts(n: int, passes: int = 1):
    """Field muls of `passes` radix-2 FFTs of size n."""
    import math

    stages = int(math.log2(n))
    return {"field_muls": passes * stages * (n // 2)}
