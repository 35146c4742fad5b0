"""Memory-bandwidth canary for the optimization rounds.

Spark times on this box are dominated by memory traffic, and the host
occasionally throttles VM memory bandwidth by 100x (measured 0.03 GB/s
single-stream copy vs ~10+ GB/s healthy) while scalar CPU loops stay
nominal — so wall-clock comparisons are only valid between runs whose
canary readings match.  Prints one JSON line: single-stream copy GB/s
and a 1e7-iteration scalar loop time.

    python tools/bw_canary.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    a = np.zeros(100_000_000 // 8)  # 100 MB
    t0 = time.perf_counter()
    for _ in range(3):
        a.copy()
    bw = 2 * 3 * a.nbytes / (time.perf_counter() - t0) / 1e9
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    loop = time.perf_counter() - t0
    print(json.dumps({
        "copy_gbps": round(bw, 3),
        "loop_1e7_s": round(loop, 3),
        "ts": time.strftime("%H:%M:%S"),
    }))


if __name__ == "__main__":
    main()
