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
from ..util import spread
from .varint import encode_varints_segmented

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
    return spread(source).select(
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


def _shard_block_builder(avgdl: float, block_size: int) -> Callable:
    """Vectorized whole-shard block encoder.

    One pandas frame per *shard* (not per term): sort by (term, doc_id),
    find term-run and block boundaries with numpy, `maximum.reduceat` the
    block maxima, and varint-encode gaps/tfs/dls for ALL blocks in three
    vectorized passes (`encode_varints_segmented`), slicing per-block
    buffers by precomputed byte offsets. Replaces a per-(term,shard)
    applyInPandas that built ~1 pandas frame per term — two orders of
    magnitude fewer Python/pandas round-trips. Group memory = one shard's
    postings; ``n_shards`` is the knob that bounds it at design scale.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        p = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = p["term"].to_numpy()
        doc_ids = p["doc_id"].to_numpy(np.int64)
        tfs = p["tf"].to_numpy(np.int64)
        dls = p["doc_len"].to_numpy(np.int64)
        n = len(p)
        new_term = np.empty(n, dtype=bool)
        new_term[0] = True
        new_term[1:] = terms[1:] != terms[:-1]
        run_id = np.cumsum(new_term) - 1
        run_start = np.flatnonzero(new_term)
        pos_in_run = np.arange(n) - run_start[run_id]
        new_block = new_term | (pos_in_run % block_size == 0)
        block_start = np.flatnonzero(new_block)
        block_end = np.concatenate((block_start[1:], [n]))
        counts = (block_end - block_start).astype(np.int64)
        wtf = (tfs * (K1 + 1)) / (tfs + K1 * (1 - B + B * dls / avgdl))
        b_max_tf = np.maximum.reduceat(tfs, block_start)
        b_max_wtf = np.maximum.reduceat(wtf, block_start)
        # delta gaps: doc_id minus predecessor, masked out at block starts
        gaps_all = np.empty(n, dtype=np.uint64)
        gaps_all[0] = 0
        gaps_all[1:] = doc_ids[1:].astype(np.uint64) - doc_ids[:-1].astype(np.uint64)
        gap_bufs = encode_varints_segmented(gaps_all[~new_block], counts - 1)
        tf_bufs = encode_varints_segmented(tfs.astype(np.uint64), counts)
        dl_bufs = encode_varints_segmented(dls.astype(np.uint64), counts)
        return pd.DataFrame(
            {
                "term": terms[block_start],
                "shard": shard,
                "block_id": (pos_in_run[block_start] // block_size).astype(np.int32),
                "first_doc_id": doc_ids[block_start],
                "n_docs": counts.astype(np.int32),
                "doc_gaps": gap_bufs,
                "tfs": tf_bufs,
                "dls": dl_bufs,
                "block_max_tf": b_max_tf.astype(np.int32),
                "block_max_wtf": b_max_wtf,
            }
        )

    return build


def blocks_from_postings(postings: DataFrame, avgdl: float, block_size: int = 128) -> DataFrame:
    return postings.groupBy("shard").applyInPandas(
        _shard_block_builder(avgdl, block_size), BLOCKS_SCHEMA
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
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    for u, fl in enumerate(unit_files):
        if ("A", u) in done:
            continue
        if fault_injector:
            fault_injector("A", u)
        # persist the tokenized unit so docs + postings share one tokenize
        # pass; MEMORY_AND_DISK bounds executor memory at unit granularity
        # (unit count is a build parameter sized so a unit fits the cluster)
        base = docs_df(spark.read.parquet(*fl)).persist(StorageLevel.MEMORY_AND_DISK)
        posts = postings_from_docs(base, n_shards)
        # per-unit dirs make the commit idempotent under overwrite; counters
        # ride the write jobs as Observation metrics — no extra count jobs
        obs_docs, obs_posts = Observation(), Observation()
        docs_out = base.drop("tokens").observe(obs_docs, F.count(F.lit(1)).alias("n"))
        docs_out.write.mode("overwrite").parquet(io.path(f"docs/unit={u}"))
        posts.observe(obs_posts, F.count(F.lit(1)).alias("n")).repartition(
            "shard"
        ).sortWithinPartitions("term", "doc_id").write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(io.path(f"postings/unit={u}"))
        base.unpersist()
        n_docs = int(obs_docs.get["n"])
        n_posts = int(obs_posts.get["n"])
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
        obs_blocks = Observation()
        blocks.observe(obs_blocks, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(io.path(f"posting_blocks/group={g}"))
        n_blocks = int(obs_blocks.get["n"])
        _ledger_append(io, spark, [("B", g, "done", 0, 0, n_blocks, source_path, CODE_VERSION)])

    # ---- dictionary: df/cf + per-term upper bound for WAND pruning
    blocks_all = spark.read.parquet(io.path("posting_blocks"))
    ub = blocks_all.groupBy("term").agg(
        F.max("block_max_wtf").alias("max_wtf"), F.sum("n_docs").alias("n_blocks_docs")
    )
    dic = dictionary_from_postings(postings).join(ub.drop("n_blocks_docs"), "term", "left")
    io.write(dic.repartitionByRange(8, "term").sortWithinPartitions("term"), "dictionary")

    return BuildResult(out_dir, n_docs, avgdl, n_shards)
