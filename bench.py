"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total wall sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Headline set: the fulltext index build + WAND/BM25 query path over the
documents table (the north-star workload) plus representative relational /
dedup / similarity queries. The index build throughput (docs/s) is reported
alongside; scripts/scaling_bench.py produces the two-parallelism scaling
evidence for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_prepper_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "ft_bm25_topk",
    "ft_bm25_topk2",
    "ft_dictionary",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q6_revenue",
    "events_windowed_count",
    "events_remove_duplicates",
    "grok_roundtrip",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "text_quality",
    "lang_id",
]


def main() -> None:
    spark = get_spark("dps-bench")
    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # ---- fulltext index build throughput over the documents corpus
    from pyspark.sql import functions as F

    from data_prepper_spark.index.build import blocks_from_postings, docs_df, postings_from_docs

    docs_src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.col("lang").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    n_docs = docs_src.count()
    out = ".bench_cache/index"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    base = docs_df(docs_src)
    posts = postings_from_docs(base, n_shards=32)
    base.drop("tokens").write.mode("overwrite").parquet(f"{out}/docs")
    posts.repartition("shard").sortWithinPartitions("term", "doc_id").write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(f"{out}/postings")
    stats = spark.read.parquet(f"{out}/docs").agg(
        F.count(F.lit(1)), F.avg("doc_len")
    ).collect()[0]
    avgdl = float(stats[1])
    postings = spark.read.parquet(f"{out}/postings")
    blocks_from_postings(postings, avgdl).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{out}/posting_blocks")
    build_sec = time.time() - t0
    timings["ft_index_build"] = round(build_sec, 3)

    # ---- headline queries
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "fulltext index build + headline query wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "docs_per_sec": round(n_docs / build_sec, 1),
                "n_docs_indexed": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
