"""Memory-bandwidth probe backing BENCH/BASELINE.md's scaling analysis.

Runs a numpy triad (a = b + s*c over ~256 MB working sets — far beyond
LLC) in N independent PROCESSES (no GIL, no Spark, no JVM) and reports
aggregate bandwidth. If aggregate GB/s stops growing well before 4x from
8 -> 32 workers, the box's shared DRAM subsystem — not the engine — is
the scaling ceiling for bandwidth-bound kernels at local[8] vs local[32].

Usage: python tools/membw_probe.py [worker counts...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N = 16_000_000  # 3 arrays x 128 MB = 384 MB working set per worker
REPS = 6

_barrier = None


def _init(b):
    global _barrier
    _barrier = b


def _triad(_):
    b = np.ones(N)
    c = np.full(N, 2.0)
    a = np.empty(N)
    # warm up: fault every page + one full untimed pass
    np.multiply(c, 3.0, out=a)
    a += b
    _barrier.wait()  # all workers start the timed window together
    t0 = time.time()
    for _ in range(REPS):
        np.multiply(c, 3.0, out=a)
        a += b
    return time.time() - t0


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 4, 8, 16, 32]
    out = {}
    for n in counts:
        barrier = mp.Barrier(n)
        with mp.Pool(n, initializer=_init, initargs=(barrier,)) as pool:
            dts = pool.map(_triad, range(n))
        # conservative: total bytes over the slowest worker's window
        bytes_total = n * REPS * 3 * 8 * N
        agg = bytes_total / max(dts) / 1e9
        out[str(n)] = round(agg, 1)
        print(f"{n:3d} workers: {agg:7.1f} GB/s aggregate "
              f"(per-worker {min(dts):.2f}-{max(dts):.2f}s)", file=sys.stderr)
    print(json.dumps({"triad_gbps_by_workers": out, "reps": REPS, "n": N}))


if __name__ == "__main__":
    main()
