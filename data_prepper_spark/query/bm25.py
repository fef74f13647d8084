"""BM25 top-k over the logical postings table (the uncompressed path).

This is the "M2" verification path (SURVEY §7.1): a pure-DataFrame plan —
term-pruned parquet scan -> broadcast join of per-term idf -> codegen'd
score expression -> hash agg by doc_id -> TakeOrderedAndProject. The WAND
path (query/wand.py) must be rank-identical to this, and this must be
rank-identical to the pure-Python oracle (tests/oracle.py).

Scale notes: the scan is pruned two ways — parquet row-group min/max on
``term`` (runs are sorted by term within shard partitions) and partition
pruning if a term->shard bloom side table is added later. The idf side is
always tiny (|query terms| rows) and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..analyzer import tokenize_py
from ..tableio import TableIO
from .common import K1, B, load_stats, query_term_stats


def score_expr(idf_col, tf_col, dl_col, avgdl: float):
    return idf_col * (tf_col * (K1 + 1)) / (tf_col + K1 * (1 - B + B * dl_col / avgdl))


def bm25_topk(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 10,
) -> DataFrame:
    """Returns (rank int, doc_id long, score double), rank 1-based."""
    io = TableIO(index_dir)
    n_docs, avgdl = load_stats(spark, io)
    terms = sorted(set(tokenize_py(query_text)))
    tstats = query_term_stats(spark, io, terms, n_docs)
    if not tstats:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    idf_df = spark.createDataFrame(
        [(t, s["idf"]) for t, s in tstats.items()], "term string, idf double"
    )
    posts = io.read(spark, "postings").where(F.col("term").isin(list(tstats)))
    scored = posts.join(F.broadcast(idf_df), "term").select(
        "doc_id",
        score_expr(F.col("idf"), F.col("tf"), F.col("doc_len"), avgdl).alias("s"),
    )
    from .common import live_filter

    topk = (
        live_filter(spark, io, scored.groupBy("doc_id").agg(F.sum("s").alias("score")))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    # rank over the already-top-k rows: partitionBy(lit(0)) declares the
    # single partition explicitly (<= k rows), silencing WindowExec's
    # move-all-data warning without changing the plan's work
    w = F.row_number().over(Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select(w.alias("rank"), "doc_id", "score")


def bm25_topk_filtered(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    predicate: str,
    k: int = 10,
) -> DataFrame:
    """Filtered search (Lucene filter-query analog): top-k BM25 among docs
    whose ``docs``-table row matches the SQL ``predicate`` (e.g.
    "lang = 'python'"). Statistics stay corpus-wide — a filter narrows the
    answer, not idf/avgdl — and the filter reaches the docs scan as a
    pushed predicate, then joins the scored aggregate as a left-semi
    (exact: applied BEFORE top-k truncation)."""
    io = TableIO(index_dir)
    n_docs, avgdl = load_stats(spark, io)
    terms = sorted(set(tokenize_py(query_text)))
    tstats = query_term_stats(spark, io, terms, n_docs)
    if not tstats:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    idf_df = spark.createDataFrame(
        [(t, s["idf"]) for t, s in tstats.items()], "term string, idf double"
    )
    posts = io.read(spark, "postings").where(F.col("term").isin(list(tstats)))
    scored = (
        posts.join(F.broadcast(idf_df), "term")
        .select(
            "doc_id",
            score_expr(F.col("idf"), F.col("tf"), F.col("doc_len"), avgdl).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    from .common import live_filter

    allowed = io.read(spark, "docs").where(predicate).select("doc_id")
    topk = (
        live_filter(spark, io, scored.join(allowed, "doc_id", "left_semi"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = F.row_number().over(Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id")))
    return topk.select(w.alias("rank"), "doc_id", "score")
