"""Host CPU-scaling ceiling probe (pure Python, no Spark).

Runs N independent busy-loop processes for a fixed window and reports
aggregate work units at 8 vs 32 workers. On a dedicated 32-core host the
32-worker aggregate is ~4x the 8-worker one; anything lower is the
*host's* ceiling (hypervisor throttling / shared tenancy), which bounds
any wall-clock scaling efficiency measurable in this sandbox.

Usage: python tools/host_probe.py [seconds_per_level]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _spin(q, seconds: float) -> None:
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        for _ in range(100_000):
            pass
        n += 1
    q.put(n)


def measure(workers: int, seconds: float) -> int:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(q, seconds)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    a = measure(8, seconds)
    b = measure(32, seconds)
    ratio = b / a
    print(
        f"8 workers: {a} units | 32 workers: {b} units | "
        f"aggregate ratio {ratio:.2f}x (ideal 4.0) | "
        f"host ceiling for 8->32 wall-clock efficiency: {ratio / 4:.2f}"
    )


if __name__ == "__main__":
    main()
