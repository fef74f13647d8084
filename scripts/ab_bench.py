"""Interleaved best-of-K A/B harness — the noise-robust comparison method
from NOTES.md, committed so perf deltas are reproducible instead of ad hoc.

The host is a co-tenant-oversubscribed VM: single timed runs vary +/-30%
when more than ~8 cores are busy, so back-to-back "before vs after" wall
times routinely show phantom 2-3x regressions that are pure hypervisor
phase. The fix is to interleave the two variants (A B A B ...) so both
sample the same noise distribution, take the per-variant BEST of K (the
minimum is the least-noise estimate of true cost on a noisy-but-
nonadversarial host), and compare those.

Library use:

    from scripts.ab_bench import interleaved_ab
    res = interleaved_ab({"single": run_single, "batched": run_batched}, k=5)
    # res = {"single": {"best": ..., "median": ..., "runs": [...]}, ...}

CLI demo (compares the engine's single-query loop vs the batched kernel on
a throwaway index; mostly a smoke test that the harness itself works):

    python scripts/ab_bench.py
"""

from __future__ import annotations

import statistics
import time
from collections.abc import Callable


def interleaved_ab(
    variants: dict[str, Callable[[], object]],
    k: int = 5,
    warmup: int = 1,
) -> dict[str, dict]:
    """Run each no-arg callable ``k`` times, interleaved round-robin
    (A B A B ...), after ``warmup`` untimed rounds. Returns per-variant
    {"best": s, "median": s, "runs": [s, ...]} — compare on "best"."""
    names = list(variants)
    for _ in range(warmup):
        for n in names:
            variants[n]()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(k):
        for n in names:
            t0 = time.time()
            variants[n]()
            runs[n].append(time.time() - t0)
    return {
        n: {"best": min(r), "median": statistics.median(r), "runs": r}
        for n, r in runs.items()
    }


def _demo() -> None:
    import json
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_prepper_spark.corpus import write_code_files
    from data_prepper_spark.index.build import build_index
    from data_prepper_spark.query.engine import IndexQueryEngine
    from data_prepper_spark.session import get_spark

    spark = get_spark("ab-bench", cores=8, shuffle_partitions=16)
    src, idx = ".data/ab_corpus", ".data/ab_index"
    if not os.path.exists(src):
        write_code_files(spark, 0.01, src)
    shutil.rmtree(idx, ignore_errors=True)
    build_index(spark, src, idx, n_shards=16, units=1, shard_groups=1)
    eng = IndexQueryEngine(spark, idx)
    queries = {f"q{i}": q for i, q in enumerate(
        ["key value table scan", "merge batch checkpoint", "row group filter"]
    )}

    def single():
        for q in queries.values():
            eng.topk(q, 10).collect()

    def batched():
        eng.topk_batch(queries, 10).collect()

    print(json.dumps(interleaved_ab({"single": single, "batched": batched}, k=5)))
    spark.stop()


if __name__ == "__main__":
    _demo()
