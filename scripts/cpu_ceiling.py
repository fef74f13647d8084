"""Host CPU-ceiling calibration for BENCH/BASELINE.md.

Runs embarrassingly parallel numpy work in independent processes at
several widths and prints achieved speedups — the upper bound any Spark
job can reach on this box. Justifies the N=4 -> 4N=16 choice in
scripts/scaling_bench.py."""

from __future__ import annotations

import multiprocessing as mp
import time


def _work(args):
    (t0,) = args
    import numpy as np

    x = np.arange(100_000, dtype=np.float64)
    cnt = 0
    end = t0 + 4
    while time.time() < end:
        x = np.sqrt(x * x + 1.0)
        cnt += 1
    return cnt


def main() -> None:
    totals = {}
    for nproc in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(nproc) as p:
            totals[nproc] = sum(p.map(_work, [(t0,)] * nproc))
        print(f"{nproc:>2} procs: total iters {totals[nproc]}")
    for a, b in ((2, 8), (4, 16), (8, 32)):
        r = totals[b] / totals[a]
        print(f"{a}->{b}: {r:.2f}x of ideal {b//a}x -> efficiency {r/(b//a):.3f}")


if __name__ == "__main__":
    main()
