"""Subprocess probe for the warm batched-query A/B: builds a small index
from a prepared corpus under the code version on PYTHONPATH, then prints
best-of-5 warm topk_batch ms/query (and single-query warm p50).

    PYTHONPATH=<variant> python scripts/query_ab_probe.py <corpus> <out>
"""

from __future__ import annotations

import shutil
import sys
import time


def main() -> None:
    corpus, out = sys.argv[1], sys.argv[2]
    from data_prepper_spark.index.build import build_index
    from data_prepper_spark.query.engine import IndexQueryEngine
    from data_prepper_spark.session import get_spark

    spark = get_spark("query-ab", cores=8, shuffle_partitions=16)
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, corpus, out, n_shards=64, units=1, shard_groups=1)
    queries = [
        "hash join spill", "block max wand", "columnar scan",
        "btree index lookup", "query optimizer cost", "vectorized filter",
        "parallel merge sort", "bloom filter probe",
    ]
    qmap = {f"q{i}": q for i, q in enumerate(queries)}
    eng = IndexQueryEngine(spark, out)
    eng.topk_batch(qmap, 10).collect()  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        eng.topk_batch(qmap, 10).collect()
        best = min(best, time.time() - t0)
    print(f"BATCH_MS {best * 1000 / len(queries):.1f}", flush=True)
    lat = []
    for i in range(16):
        t0 = time.time()
        eng.topk(queries[i % len(queries)], 10).collect()
        lat.append(time.time() - t0)
    lat = sorted(lat[8:])
    print(f"SINGLE_P50_MS {lat[len(lat)//2]*1000:.1f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
