"""Golden gate: the full committed reference query set (FIXTURES.md §2)
must be rank-identical (and score-identical to 1e-6) between the engine's
WAND path and the pure-Python oracle."""

from __future__ import annotations

from data_prepper_spark.query.wand import bm25_topk_wand
from data_prepper_spark.reference_queries import QUERY_SET
from tests.oracle import bm25_topk as oracle_topk


def test_reference_query_set(spark, index_dir, corpus_docs):
    failures = []
    for qid, q, k in QUERY_SET:
        want = [(r[0], r[1], round(r[2], 6)) for r in oracle_topk(corpus_docs, q, k)]
        got = [
            (r.rank, r.doc_id, round(r.score, 6))
            for r in bm25_topk_wand(spark, index_dir, q, k).collect()
        ]
        if got != want:
            failures.append((qid, q, got[:3], want[:3]))
    assert not failures, failures
