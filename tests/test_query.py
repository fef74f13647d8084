"""Rank-identity: engine (both paths) vs pure-Python oracle (SURVEY §5.2)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.analyzer import duckdb_tokens_sql
from data_prepper_spark.query.bm25 import bm25_topk
from data_prepper_spark.query.wand import bm25_topk_wand
from tests.oracle import bm25_topk as oracle_topk

# query shapes from FIXTURES.md §2: rare term, hot term, hot+rare
# conjunction, identifier-split, absent term, lang keyword; k in {1,10,100}
QUERIES = [
    ("parseJson buffer", 10),
    ("the", 10),
    ("the index_merge", 10),
    ("parse json response", 10),
    ("zzz_absent_term", 10),
    ("return", 10),
    ("scanChunk emitState", 100),
    ("INDEX_MERGE", 1),
    ("the int return i", 10),
    ("flushBatch shard term doc", 25),
]


def _norm(rows):
    return [(r[0], r[1], round(r[2], 6)) for r in rows]


@pytest.mark.parametrize("q,k", QUERIES)
def test_rank_identity(spark, index_dir, corpus_docs, q, k):
    want = _norm(oracle_topk(corpus_docs, q, k))
    got_df = _norm(
        [(r.rank, r.doc_id, r.score) for r in bm25_topk(spark, index_dir, q, k).collect()]
    )
    got_wand = _norm(
        [(r.rank, r.doc_id, r.score) for r in bm25_topk_wand(spark, index_dir, q, k).collect()]
    )
    assert got_df == want
    assert got_wand == want


def test_duckdb_df_dl_crosscheck(spark, corpus_dir, index_dir):
    """df/doc_len recounted by DuckDB over the raw corpus (SURVEY §5.2)."""
    con = duckdb.connect()
    toks = duckdb_tokens_sql("content")
    duck = con.execute(
        f"""
        with t as (select repo, path, commit, unnest({toks}) as term
                   from read_parquet('{corpus_dir}/*.parquet')),
        dl as (select repo, path, commit, count(*) as doc_len from t group by all),
        df as (select term, count(distinct (repo, path, commit)) as df from t group by term)
        select (select sum(doc_len) from dl) as total_len,
               (select count(*) from df) as n_terms,
               (select sum(df) from df) as sum_df
        """
    ).fetchone()
    posts = spark.read.parquet(f"{index_dir}/postings")
    docs = spark.read.parquet(f"{index_dir}/docs")
    assert docs.agg(F.sum("doc_len")).collect()[0][0] == duck[0]
    dic = spark.read.parquet(f"{index_dir}/dictionary")
    assert dic.count() == duck[1]
    assert dic.agg(F.sum("df")).collect()[0][0] == duck[2]
    assert posts.count() == duck[2]


@pytest.mark.parametrize("q,k", [("the", 10), ("parse json response", 10), ("return", 100), ("the int return i", 10)])
def test_pointer_wand_equals_exhaustive(spark, index_dir, corpus_docs, q, k, monkeypatch):
    """The pointer (block-max pruning) kernel and the vectorized exhaustive
    kernel must return identical answers; the threshold only picks which
    one runs. Forces the pointer path by zeroing the threshold."""
    from data_prepper_spark.query import wand as wand_mod

    fast = _norm(
        [(r.rank, r.doc_id, r.score) for r in bm25_topk_wand(spark, index_dir, q, k).collect()]
    )
    monkeypatch.setattr(wand_mod, "EXHAUSTIVE_THRESHOLD", -1)
    slow = _norm(
        [(r.rank, r.doc_id, r.score) for r in bm25_topk_wand(spark, index_dir, q, k).collect()]
    )
    want = _norm(oracle_topk(corpus_docs, q, k))
    assert fast == want and slow == want


def test_batch_equals_per_query(spark, index_dir):
    """topk_batch (decode-once batch kernel) must be rank-identical to
    per-query topk for every query in the batch."""
    from data_prepper_spark.query.engine import IndexQueryEngine

    eng = IndexQueryEngine(spark, index_dir, persist_blocks=False)
    qmap = {f"q{i}": q for i, (q, _) in enumerate(QUERIES[:6])}
    batch = eng.topk_batch(qmap, 10).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 6)))
    for qid, q in qmap.items():
        single = _norm([(r.rank, r.doc_id, r.score) for r in eng.topk(q, 10).collect()])
        assert sorted(got.get(qid, [])) == sorted(single), qid


def test_bm25_topk_filtered_indexed(spark, index_dir, corpus_dir, corpus_docs):
    """Indexed filtered search: results satisfy the predicate, scores are
    the corpus-wide BM25 scores (filter narrows answers, not statistics)."""
    from data_prepper_spark.query.bm25 import bm25_topk_filtered

    docs = spark.read.parquet(corpus_dir)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    lang = sorted(langs)[0]
    q = "return value"
    got = bm25_topk_filtered(spark, index_dir, q, f"lang = '{lang}'", k=10).collect()
    assert got
    allowed = {
        r["doc_id"]
        for r in spark.read.parquet(f"{index_dir}/docs").where(f"lang = '{lang}'").collect()
    }
    assert {r["doc_id"] for r in got} <= allowed
    full = {r.doc_id: round(r.score, 6) for r in bm25_topk(spark, index_dir, q, k=10**6).collect()}
    for r in got:
        assert round(r["score"], 6) == full[r["doc_id"]]
    # equals the brute-force answer: filter the oracle's full ranking
    want = [
        (d, round(s, 6))
        for _, d, s in oracle_topk(corpus_docs, q, 10**6)
        if d in allowed
    ][:10]
    assert [(r["doc_id"], round(r["score"], 6)) for r in got] == want


def test_engine_result_cache(spark, index_dir):
    """Opt-in (query, k) result cache: hits return identical rows without
    re-running the kernel, distinct k are distinct entries, and the LRU
    stays bounded. The engine is snapshot-pinned, so entries cannot go
    stale within an instance."""
    from data_prepper_spark.query.engine import IndexQueryEngine

    eng = IndexQueryEngine(spark, index_dir, persist_blocks=False, result_cache_size=2)
    cold = eng.topk("def return value", 10).collect()
    assert eng.topk("def return value", 10).collect() == cold  # hit
    assert len(eng._result_cache) == 1
    k5 = eng.topk("def return value", 5).collect()  # distinct k = distinct entry
    assert [tuple(r) for r in k5] == [tuple(r) for r in cold[:5]]
    assert len(eng._result_cache) == 2
    eng.topk("class import", 10).collect()  # evicts the LRU entry
    assert len(eng._result_cache) == 2
    # uncached engine agrees (cache changes latency, never results)
    plain = IndexQueryEngine(spark, index_dir, persist_blocks=False)
    assert plain.topk("def return value", 10).collect() == cold
    # empty-result queries cache cleanly too
    assert eng.topk("qqqqxyzw", 3).collect() == []
    assert eng.topk("qqqqxyzw", 3).collect() == []


def test_engine_topk_rows_serving_path(spark, index_dir):
    """topk_rows: a cache hit returns rows with no Spark job; results
    identical to the DataFrame path."""
    import time

    from data_prepper_spark.query.engine import IndexQueryEngine

    eng = IndexQueryEngine(spark, index_dir, persist_blocks=False, result_cache_size=8)
    want = eng.topk("def return value", 10).collect()
    t0 = time.time()
    rows = eng.topk_rows("def return value", 10)
    dt = time.time() - t0
    assert rows == want
    assert dt < 0.05, dt  # hit must be job-free (sub-50ms even on a noisy host)
    # uncached engine: topk_rows still computes correctly
    plain = IndexQueryEngine(spark, index_dir, persist_blocks=False)
    assert plain.topk_rows("def return value", 10) == want
