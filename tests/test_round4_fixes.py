"""Round-4 fixes: ADVICE r3 findings (star-edge verification exemption,
refresh ledger-before-swap crash window, iforest empty-sample guard,
generation GC grace period, DSL msm/term robustness)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.index.build import (
    add_to_index,
    build_index,
    refresh_index,
    resolved_table_path,
)
from data_prepper_spark.query.engine import IndexQueryEngine


def _split_corpus(corpus_dir, tmp_path):
    files = sorted(f for f in os.listdir(corpus_dir) if f.endswith(".parquet"))
    half = len(files) // 2
    s1, s2, full = (str(tmp_path / n) for n in ("s1", "s2", "full"))
    for d in (s1, s2, full):
        os.makedirs(d, exist_ok=True)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(corpus_dir, f), (s1 if i < half else s2))
        shutil.copy(os.path.join(corpus_dir, f), full)
    return s1, s2, full


# ---------------------------------------------------------------- dedupe --
def test_star_edges_exempt_from_jaccard_verification(spark):
    """Oversized-bucket star edges are connectivity edges: they must
    survive verification even when their jaccard is below the threshold,
    while ordinary full pairs are still filtered."""
    from data_prepper_spark.operators.dedupe import minhash_lsh_pairs

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    rows = [(i, t1) for i in range(1, 7)] + [(7, t2), (8, t2)]
    df = spark.createDataFrame(rows, "id long, content string")
    out = minhash_lsh_pairs(
        df, "content", "id",
        num_perm=16, bands=4, shingle_n=3,
        verify_threshold=1.01,  # impossible: every full pair is filtered
        max_bucket_size=3,
    ).collect()
    got = {(r.id_a, r.id_b) for r in out}
    # docs 1-6 share every LSH bucket (identical text) -> oversized bucket
    # -> star to min id survives unconditionally; (7, 8) is a small-bucket
    # full pair, jaccard 1.0 < 1.01 -> filtered
    assert got == {(1, b) for b in range(2, 7)}, got
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in out)


def test_capped_pairs_without_verify_schema_stable(spark):
    from data_prepper_spark.operators.dedupe import minhash_lsh_pairs

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(i, t1) for i in range(1, 5)], "id long, content string")
    out = minhash_lsh_pairs(df, "content", "id", max_bucket_size=2)
    assert out.columns == ["id_a", "id_b"]
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2), (1, 3), (1, 4)}


# --------------------------------------------------------------- anomaly --
def test_iforest_empty_sample_guard():
    """A cut landing exactly on the sample minimum leaves one side's
    sample empty while eval points still route there — must not crash."""
    from data_prepper_spark.operators.anomaly import _iforest_scores

    class FakeRng:
        def choice(self, n, size, replace):
            return np.arange(size)

        def integers(self, n):
            return 0

        def uniform(self, lo, hi):
            return lo  # worst case: empty left sample

    X = np.array([[1.0], [2.0], [0.0]])
    scores = _iforest_scores(X, n_trees=1, sample_size=2, rng=FakeRng())
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    assert ((scores > 0) & (scores <= 1)).all()


# ------------------------------------------------------------------- dsl --
def test_parse_msm_forms():
    from data_prepper_spark.query.dsl import _parse_msm

    assert _parse_msm(2, 5) == 2
    assert _parse_msm("3", 5) == 3
    assert _parse_msm(-1, 5) == 4
    assert _parse_msm("-2", 5) == 3
    assert _parse_msm("75%", 4) == 3
    assert _parse_msm("75%", 3) == 2  # rounded down
    assert _parse_msm("-25%", 4) == 3
    assert _parse_msm("50%", 2) == 1
    assert _parse_msm(10, 3) == 3  # clamped
    with pytest.raises(ValueError):
        _parse_msm("abc", 3)


def test_msm_percentage_equals_integer(spark, index_dir):
    from data_prepper_spark.query.dsl import search

    should = [{"match": {"content": "def"}}, {"match": {"content": "buffer"}}]
    pct = {"bool": {"should": should, "minimum_should_match": "100%"}}
    exact = {"bool": {"should": should, "minimum_should_match": 2}}
    got = search(spark, index_dir, pct, size=10000).collect()
    want = search(spark, index_dir, exact, size=10000).collect()
    assert [(r.rank, r.doc_id, r.score) for r in got] == [
        (r.rank, r.doc_id, r.score) for r in want
    ]


def test_term_object_form(spark, index_dir):
    from data_prepper_spark.query.dsl import search

    plain = {"bool": {"must": [{"match": {"content": "def"}}],
                      "filter": [{"term": {"lang": "python"}}]}}
    obj = {"bool": {"must": [{"match": {"content": "def"}}],
                    "filter": [{"term": {"lang": {"value": "python"}}}]}}
    got = search(spark, index_dir, obj, size=20).collect()
    want = search(spark, index_dir, plain, size=20).collect()
    assert [(r.rank, r.doc_id) for r in got] == [(r.rank, r.doc_id) for r in want]
    with pytest.raises(ValueError, match="value"):
        search(spark, index_dir, {"bool": {"must": [{"match": {"content": "def"}}],
                                           "filter": [{"term": {"lang": {"vlaue": "x"}}}]}})


# ------------------------------------------------ refresh crash ordering --
def test_refresh_ledger_commits_before_pointer_swap(spark, corpus_dir, tmp_path, monkeypatch):
    """ADVICE r3 (medium): crash AFTER the generation swap but before the
    ledger append let a replayed layered add duplicate its postings. The
    fix appends the ledger (invalidated/compacted/done) BEFORE the swap;
    a crash between the two leaves the old generation current with the
    layered docs visible, and a replayed add no-ops on the 'compacted'
    rows. Completing the refresh then matches a clean build."""
    import data_prepper_spark.tableio as tio

    s1, s2, full = _split_corpus(corpus_dir, tmp_path)
    idx = str(tmp_path / "idx_preswap")
    clean = str(tmp_path / "idx_preswap_clean")
    build_index(spark, s1, idx, n_shards=8, units=1, shard_groups=2)
    add_to_index(spark, s2, idx, n_shards=8, units=1, remerge=False)
    pre = IndexQueryEngine(spark, idx, persist_blocks=False).topk("def return value", 10).collect()

    orig = tio.TableIO.set_gen_state

    def boom(self, **kw):
        if "posting_blocks" in kw:
            raise RuntimeError("injected pre-swap crash")
        return orig(self, **kw)

    monkeypatch.setattr(tio.TableIO, "set_gen_state", boom)
    with pytest.raises(RuntimeError, match="pre-swap"):
        refresh_index(spark, idx)
    monkeypatch.setattr(tio.TableIO, "set_gen_state", orig)

    # old generation still current and queryable, layered docs visible
    post = IndexQueryEngine(spark, idx, persist_blocks=False).topk("def return value", 10).collect()
    assert post == pre
    # replayed add of the same batch recognizes the 'compacted' ledger
    # rows and no-ops instead of writing a duplicate segment
    groups_before = set(os.listdir(resolved_table_path(idx, "posting_blocks")))
    add_to_index(spark, s2, idx, n_shards=8, units=1, remerge=False)
    groups_after = set(os.listdir(resolved_table_path(idx, "posting_blocks")))
    assert groups_after == groups_before
    # completing the refresh equals a clean build bit-identically
    refresh_index(spark, idx)
    build_index(spark, full, clean, n_shards=8, units=2, shard_groups=2)
    bexpr = (
        "bit_xor(xxhash64(term_hash, shard, block_id, first_doc_id, n_docs, "
        "doc_gaps, tfs, dls, block_max_tf, block_max_wtf))"
    )

    def _chk(path):
        return spark.read.parquet(path).select(F.expr(bexpr)).collect()[0][0]

    assert _chk(resolved_table_path(idx, "posting_blocks")) == _chk(
        resolved_table_path(clean, "posting_blocks")
    )


# -------------------------------------------------------- gc grace period --
def test_gc_retention_keeps_pinned_reader_generation(spark, corpus_dir, tmp_path):
    """Default DPS_GC_RETAIN=1: an engine opened before a refresh keeps
    reading its pinned generation (blocks AND dictionary) after the swap;
    a re-opened engine sees the merged corpus."""
    s1, s2, _ = _split_corpus(corpus_dir, tmp_path)
    idx = str(tmp_path / "idx_retain")
    build_index(spark, s1, idx, n_shards=8, units=1, shard_groups=2)
    engine = IndexQueryEngine(spark, idx, persist_blocks=False)
    pre = engine.topk("def return value", 10).collect()

    add_to_index(spark, s2, idx, n_shards=8, units=1, remerge=True)  # gen bump

    # same engine: identical pre-refresh answer (pinned snapshot)
    assert engine.topk("def return value", 10).collect() == pre
    # a query with UNCACHED terms forces a dictionary read -> must hit the
    # retained old-generation dictionary, not FileNotFound or new stats
    fresh_terms = engine.topk("import self data", 5).collect()
    assert isinstance(fresh_terms, list)
    # re-opened engine sees the merged corpus
    fresh = IndexQueryEngine(spark, idx, persist_blocks=False)
    assert fresh.n_docs > engine.n_docs
    assert os.path.basename(resolved_table_path(idx, "posting_blocks")).endswith(".gen-1")
    # old generation dir retained on disk for the grace period
    assert os.path.isdir(os.path.join(idx, "posting_blocks"))
