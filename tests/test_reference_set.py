"""Golden gate: the full committed reference query set (FIXTURES.md §2)
must be rank-identical (and score-identical to 1e-6) between the engine
and the pure-Python oracle. Runs through the batched engine path — one
Spark job for all 50 queries — which is itself asserted identical to the
one-shot WAND path on a sample."""

from __future__ import annotations

import pytest

from data_prepper_spark.query.engine import IndexQueryEngine
from data_prepper_spark.query.wand import bm25_topk_wand
from data_prepper_spark.reference_queries import QUERY_SET
from tests.oracle import bm25_topk as oracle_topk


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    eng = IndexQueryEngine(spark, index_dir)
    yield eng
    eng.close()


def test_reference_query_set_batched(spark, engine, corpus_docs):
    # k differs per query: group by k and batch each group
    failures = []
    by_k: dict[int, dict[str, str]] = {}
    for qid, q, k in QUERY_SET:
        by_k.setdefault(k, {})[str(qid)] = q
    got_all: dict[str, list] = {}
    for k, queries in by_k.items():
        for r in engine.topk_batch(queries, k).collect():
            got_all.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 6))
            )
    for qid, q, k in QUERY_SET:
        want = [(r[0], r[1], round(r[2], 6)) for r in oracle_topk(corpus_docs, q, k)]
        got = sorted(got_all.get(str(qid), []))
        if got != sorted(want):
            failures.append((qid, q, got[:3], want[:3]))
    assert not failures, failures


def test_batch_matches_one_shot_wand(spark, engine, index_dir):
    sample = [(qid, q, k) for qid, q, k in QUERY_SET[:8]]
    batch = engine.topk_batch({str(qid): q for qid, q, _ in sample}, 10).collect()
    by_q: dict[str, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, q, _ in sample:
        single = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in bm25_topk_wand(spark, index_dir, q, 10).collect()
        ]
        assert sorted(by_q.get(str(qid), [])) == sorted(single), (qid, q)
