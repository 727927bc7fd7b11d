"""Memory-bandwidth / page-fault-throughput microbenchmark for the sandbox.

Explains the local-mode scaling ceiling documented in BASELINE.md: this VM's
aggregate memory-allocation throughput saturates near ~2 GB/s total and
barely rises with worker count, so allocation-heavy stages (Arrow streams,
shuffle, Python object churn) become bandwidth-bound past ~4-8 cores. A pure
register workload (bottom) scales near-linearly on the same box, isolating
the memory subsystem as the constraint.

Usage: python tools/membench.py
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np


def memcopy(_):
    a = np.arange(25_000_000)  # 200 MB, fresh pages per worker
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 3.0:
        _b = a.copy()
        n += 1
    return n


def burn(_):
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < 2.0:
        x += 1
    return x


def main():
    print("alloc+copy (read 200MB + write 200MB per iter):")
    for k in [1, 2, 4, 8, 16, 32]:
        with mp.Pool(k) as p:
            r = p.map(memcopy, range(k))
        total = sum(r) / 3 * 0.4
        print(f"  {k:2d} workers: {total:6.2f} GB/s aggregate ({total / k:.2f}/worker)")
    print("register-only loop (no memory traffic):")
    base = None
    for k in [1, 4, 16, 32]:
        with mp.Pool(k) as p:
            r = p.map(burn, range(k))
        per = sum(r) / k / 2e6
        base = base or per
        print(f"  {k:2d} workers: {per:6.1f}M iters/s per worker ({per / base:.2f}x of 1-worker)")


if __name__ == "__main__":
    main()
