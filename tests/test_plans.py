"""Physical-plan guards: the optimizations the engine depends on must be
visible in `explain` output — filter pushdown to parquet, broadcast
joins for small dimensions, whole-stage codegen on the hot paths. These
are regression tests for plan shape, not results."""

from __future__ import annotations

from pyspark.sql import functions as F


import contextlib
import io


def _capture(df, mode) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _capture(df, True)


def _formatted(df) -> str:
    return _capture(df, "formatted")


def test_dictionary_lookup_pushdown(spark, index_dir):
    dic = spark.read.parquet(f"{index_dir}/dictionary").where(
        F.col("term").isin(["parse", "buffer"])
    )
    s = _formatted(dic)
    assert "PushedFilters" in s and "term" in s.split("PushedFilters")[1][:200]


def test_blocks_scan_pushdown_on_term_hash(spark, index_dir):
    blocks = spark.read.parquet(f"{index_dir}/posting_blocks").where(
        F.col("term_hash").isin([123, 456])
    )
    s = _formatted(blocks)
    assert "PushedFilters" in s and "term_hash" in s.split("PushedFilters")[1][:300]


def test_docs_projection_prunes_columns(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "doc_len")
    s = _formatted(docs)
    read_schema = s.split("ReadSchema")[1][:200]
    assert "doc_id" in read_schema and "content_sha256" not in read_schema


def test_small_dim_join_broadcasts(spark):
    big = spark.range(0, 100000).select(
        F.col("id"), (F.col("id") % 100).alias("k")
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    joined = big.join(dim, "k")
    assert "BroadcastHashJoin" in _plan(joined)


def test_tokenizer_stays_in_codegen(spark, corpus_dir):
    from data_prepper_spark.analyzer import tokens_col

    df = spark.read.parquet(corpus_dir).select(F.size(tokens_col("content")))
    phys = _plan(df).split("== Physical Plan ==")[1]
    # `*(n)` prefixes mark whole-stage-codegen'd operators
    assert "*(1) Project" in phys, phys


def test_no_row_at_a_time_python_udf_in_package():
    """Vectorized-only discipline (SURVEY §7.2): no `F.udf(` / `@udf` row
    UDFs anywhere in the package — pandas/Arrow kernels only."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "data_prepper_spark"
    bad = []
    for py in root.rglob("*.py"):
        src = py.read_text()
        if re.search(r"(?<!pandas_)\budf\s*\(", src.replace("applyInPandas", "")):
            bad.append(str(py))
    assert not bad, bad


def test_phrase_adhoc_tokenizes_once(spark):
    """Regression guard: HOF-lambda formulations re-inline the analyzer
    (6x tokenization, 10x slower); the plan must contain the two camel
    regexp_replace rules exactly once."""
    from data_prepper_spark.query.phrase import phrase_match_adhoc

    docs = spark.createDataFrame([(1, "a table scan b")], "doc_id long, text string")
    out = phrase_match_adhoc(docs, "text", "doc_id", "table scan")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") == 2, plan.count("regexp_replace")


def test_phrase_proximity_plan_skips_postings(spark, corpus_dir, index_dir, tmp_path_factory):
    """phrase_topk(proximity=True) scores the phrase pseudo-term from
    n_matches + doc_len only — the plan must contain NO scan of the
    (large) postings table, while bag mode does scan it."""
    import os
    import shutil

    from data_prepper_spark.query.phrase import build_positions, phrase_topk

    if not os.path.exists(f"{index_dir}/positions"):
        d = str(tmp_path_factory.mktemp("posidx_plan"))
        build_positions(spark, corpus_dir, d, n_shards=8)
        shutil.copytree(f"{d}/positions", f"{index_dir}/positions")
    prox = _plan(phrase_topk(spark, index_dir, "return self", k=5, proximity=True))
    assert "/postings" not in prox
    assert "/docs" in prox  # doc_len join
    bag = _plan(phrase_topk(spark, index_dir, "return self", k=5))
    assert "/postings" in bag


def test_r5_plan_shapes(spark, corpus_dir):
    """r5 operators keep the plans you'd want at 100 TB: the suggester
    broadcasts the token side (one dictionary pass, no shuffle join);
    composite pages are TakeOrderedAndProject (top-size per partition +
    driver merge, never a global sort)."""
    from data_prepper_spark.query.dsl import bucket_agg_adhoc
    from data_prepper_spark.query.suggest import suggest_terms_adhoc

    docs = spark.read.parquet(corpus_dir)
    sugg = suggest_terms_adhoc(docs, "content", "retrn vlue", size=5)
    plan = sugg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    comp = bucket_agg_adhoc(
        docs.withColumn("doc_len", F.length("content")),
        {"composite": {"sources": [
            {"lang": {"terms": {"field": "lang"}}},
            {"len": {"histogram": {"field": "doc_len", "interval": 100}}},
        ], "size": 5}},
    )
    cplan = comp._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in cplan
