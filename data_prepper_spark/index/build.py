"""Inverted-index build: docs / postings / dictionary / compressed blocks.

Replaces the reference's delegation of indexing to OpenSearch `_bulk`
(data-prepper-plugins/opensearch/.../OpenSearchSink.java:316) with a native
Spark build. Design choices, justified for a 1000-executor / 100 TB corpus:

- **Document-space sharding instead of runtime salting.** ``shard =
  unsigned(doc_id) >> (64 - log2(n_shards))``. doc_ids are xxhash64 values,
  hence uniform, so shards are balanced by construction. A Zipf-hot term
  ("the", df ~ 10^11 at design scale) is split across all shards, bounding
  every posting-build group to df / n_shards — deterministic skew control
  where AQE alone can't help (groupBy-applyInPandas isn't a join). Shards
  are *disjoint doc_id ranges*, so block-max WAND runs per shard with no
  cross-shard coordination and a cheap top-k merge. This is the classic
  document-partitioned distributed index, expressed as a Spark column.

- **Two shuffles total.** (1) partial-aggregated groupBy(term, doc_id) for
  tf (map-side combine shrinks Zipf duplicates before the exchange);
  (2) repartition to (term, shard) groups for block building. Dictionary
  and corpus_stats are partial-agg rollups that reuse those outputs.

- **Vectorized-only Python.** The single non-JVM step is the block encoder
  (applyInPandas, Arrow batches, numpy varint codec). Tokenize/explode/
  count/aggregate are all whole-stage-codegen built-ins.

- **Resumable** via a build ledger (the analog of the reference's
  lease-based source coordination, core:sourcecoordination/
  LeaseBasedSourceCoordinator.java:141-316): stage A (tokenize -> shard-
  partitioned posting runs + docs) checkpoints per unit of input files;
  stage B (runs -> compressed blocks) checkpoints per shard group and
  reads only that group's runs via partition pruning.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..tableio import TableIO
from .varint import encode_doc_ids, encode_varints

K1 = 1.2
B = 0.75
CODE_VERSION = "dps-0.1"

BLOCKS_SCHEMA = (
    "term string, shard int, block_id int, first_doc_id long, n_docs int, "
    "doc_gaps binary, tfs binary, dls binary, block_max_tf int, block_max_wtf double"
)


def doc_id_col() -> F.Column:
    return F.xxhash64("repo", "path", "commit")


def shard_col(doc_id, n_shards: int) -> F.Column:
    bits = int(math.log2(n_shards))
    assert 2**bits == n_shards, "n_shards must be a power of two"
    return F.shiftrightunsigned(doc_id, 64 - bits).cast("int")


def docs_df(source: DataFrame) -> DataFrame:
    """docs table + in-flight token array (single scan feeds both outputs)."""
    return source.select(
        doc_id_col().alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2("content", 256).alias("content_sha256"),
        tokens_col("content").alias("tokens"),
    ).withColumn("doc_len", F.size("tokens"))


def postings_from_docs(with_tokens: DataFrame, n_shards: int) -> DataFrame:
    """Logical postings (term, doc_id, tf, doc_len, shard).

    doc_len is denormalized onto every posting so the query path never
    joins the (huge) docs table at scoring time; it compresses to ~1 byte
    in the varint blocks.
    """
    return (
        with_tokens.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .withColumn("shard", shard_col(F.col("doc_id"), n_shards))
    )


def _block_builder(avgdl: float, block_size: int) -> Callable:
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        p = pdf.sort_values("doc_id")
        doc_ids = p["doc_id"].to_numpy(np.int64)
        tfs = p["tf"].to_numpy(np.int64)
        dls = p["doc_len"].to_numpy(np.int64)
        wtf = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / avgdl))
        rows = []
        for bi, s in enumerate(range(0, len(doc_ids), block_size)):
            e = min(s + block_size, len(doc_ids))
            first, gaps = encode_doc_ids(doc_ids[s:e])
            rows.append(
                (
                    term,
                    shard,
                    bi,
                    first,
                    e - s,
                    gaps,
                    encode_varints(tfs[s:e].astype(np.uint64)),
                    encode_varints(dls[s:e].astype(np.uint64)),
                    int(tfs[s:e].max()),
                    float(wtf[s:e].max()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "shard", "block_id", "first_doc_id", "n_docs",
                "doc_gaps", "tfs", "dls", "block_max_tf", "block_max_wtf",
            ],
        )

    return build


def blocks_from_postings(postings: DataFrame, avgdl: float, block_size: int = 128) -> DataFrame:
    return postings.groupBy("term", "shard").applyInPandas(
        _block_builder(avgdl, block_size), BLOCKS_SCHEMA
    )


def dictionary_from_postings(postings: DataFrame) -> DataFrame:
    """term -> df, cf, max_wtf-input stats. Partial agg absorbs Zipf skew."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    avgdl: float
    n_shards: int


def _ledger_append(io: TableIO, spark: SparkSession, rows: list[tuple]) -> None:
    df = spark.createDataFrame(
        rows,
        "stage string, unit_id int, state string, docs_tokenized long, "
        "postings_emitted long, blocks_written long, source_snapshot string, "
        "code_version string",
    ).withColumn("updated_at", F.current_timestamp())
    io.write(df, "build_ledger", mode="append")


def _ledger_done(io: TableIO, spark: SparkSession) -> set[tuple[str, int]]:
    if not io.exists("build_ledger"):
        return set()
    rows = io.read(spark, "build_ledger").where("state = 'done'").select("stage", "unit_id").collect()
    return {(r.stage, r.unit_id) for r in rows}


def build_index(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    n_shards: int = 64,
    block_size: int = 128,
    units: int = 4,
    shard_groups: int = 4,
    resume: bool = True,
    fault_injector: Callable[[str, int], None] | None = None,
) -> BuildResult:
    """Resumable two-stage index build from a parquet ``code_files`` path.

    ``fault_injector(stage, unit)`` is a test hook called before each unit
    commits — raising from it simulates a mid-build crash.
    """
    io = TableIO(out_dir)
    done = _ledger_done(io, spark) if resume else set()

    # ---- stage A: tokenize + shard-partitioned posting runs, per file unit
    files = sorted(
        os.path.join(source_path, f)
        for f in os.listdir(source_path)
        if f.endswith(".parquet")
    )
    units = max(1, min(units, len(files)))
    unit_files = [files[i::units] for i in range(units)]
    for u, fl in enumerate(unit_files):
        if ("A", u) in done:
            continue
        if fault_injector:
            fault_injector("A", u)
        base = docs_df(spark.read.parquet(*fl))
        posts = postings_from_docs(base, n_shards)
        # per-unit dirs make the commit idempotent under overwrite
        docs_out = base.drop("tokens")
        docs_out.write.mode("overwrite").parquet(io.path(f"docs/unit={u}"))
        posts.repartition("shard").sortWithinPartitions("term", "doc_id").write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(io.path(f"postings/unit={u}"))
        n_docs = spark.read.parquet(io.path(f"docs/unit={u}")).count()
        n_posts = spark.read.parquet(io.path(f"postings/unit={u}")).count()
        _ledger_append(io, spark, [("A", u, "done", n_docs, n_posts, 0, source_path, CODE_VERSION)])

    docs = spark.read.parquet(io.path("docs"))  # unit=* discovered as partition
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    io.write(
        spark.createDataFrame([(n_docs, avgdl)], "n_docs long, avgdl double"),
        "corpus_stats",
    )

    postings = spark.read.parquet(io.path("postings"))

    # ---- stage B: runs -> compressed block-max blocks, per shard group
    shard_groups = max(1, min(shard_groups, n_shards))
    for g in range(shard_groups):
        if ("B", g) in done:
            continue
        if fault_injector:
            fault_injector("B", g)
        grp = postings.where(F.col("shard") % shard_groups == g)  # partition-pruned
        blocks = blocks_from_postings(grp, avgdl, block_size)
        blocks.write.mode("overwrite").partitionBy("shard").parquet(
            io.path(f"posting_blocks/group={g}")
        )
        n_blocks = spark.read.parquet(io.path(f"posting_blocks/group={g}")).count()
        _ledger_append(io, spark, [("B", g, "done", 0, 0, n_blocks, source_path, CODE_VERSION)])

    # ---- dictionary: df/cf + per-term upper bound for WAND pruning
    blocks_all = spark.read.parquet(io.path("posting_blocks"))
    ub = blocks_all.groupBy("term").agg(
        F.max("block_max_wtf").alias("max_wtf"), F.sum("n_docs").alias("n_blocks_docs")
    )
    dic = dictionary_from_postings(postings).join(ub.drop("n_blocks_docs"), "term", "left")
    io.write(dic.repartitionByRange(8, "term").sortWithinPartitions("term"), "dictionary")

    return BuildResult(out_dir, n_docs, avgdl, n_shards)
