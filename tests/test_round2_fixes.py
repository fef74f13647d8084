"""Regression tests for the round-1 judge/advice findings:

- rcf_anomalies max_groups cap was a no-op (anomaly.py)
- write_with_quarantine crashed / miscounted for non-parquet codecs
- grok packed extraction silently shifted fields when a captured value
  contained the \\x1e sentinel
- rebuilding with resume=False into a dirty out_dir double-counted the
  append-only ledger rows, corrupting n_docs/avgdl (ADVICE medium)
- xxhash64 term collisions silently merged postings (now detected)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.index.build import build_index, hash_collisions
from data_prepper_spark.operators.anomaly import rcf_anomalies
from data_prepper_spark.operators.parse import grok
from data_prepper_spark.sinks import write_with_quarantine


def test_rcf_max_groups_cap(spark):
    # 6 groups, cap at 2: exactly the 2 smallest-hash groups are scored,
    # every row of the other 4 passes through with grade null
    rows = [(f"g{g}", float(v)) for g in range(6) for v in [1, 2, 3, 1000]]
    df = spark.createDataFrame(rows, "k string, v double")
    out = rcf_anomalies(df, ["k"], "v", max_groups=2).collect()
    scored_groups = {r["k"] for r in out if r["grade"] is not None}
    passthrough_groups = {r["k"] for r in out if r["grade"] is None}
    assert len(scored_groups) == 2
    assert len(passthrough_groups) == 4
    assert not scored_groups & passthrough_groups
    # passthrough keeps ALL rows of its groups
    n_pass = sum(1 for r in out if r["grade"] is None)
    assert n_pass == 4 * 4
    # under the cap, everything is scored (no passthrough rows)
    uncapped = rcf_anomalies(df, ["k"], "v", max_groups=100).collect()
    assert all(r["grade"] is not None for r in uncapped)


@pytest.mark.parametrize("codec", ["csv", "json"])
def test_quarantine_non_parquet(spark, tmp_path, codec):
    df = spark.createDataFrame(
        [(1, "ok"), (2, "bad"), (3, "ok"), (4, None)], "id int, status string"
    )
    good, bad = write_with_quarantine(
        df,
        str(tmp_path / "out"),
        "status = 'ok'",
        str(tmp_path / "dlq"),
        codec=codec,
    )
    assert (good, bad) == (2, 2)
    rd = spark.read.option("header", "true").csv if codec == "csv" else spark.read.json
    assert rd(str(tmp_path / "out")).count() == 2
    dlq = rd(str(tmp_path / "dlq"))
    assert dlq.count() == 2
    assert "dlq_reason" in dlq.columns


def test_grok_sentinel_in_value(spark):
    # a captured value containing \x1e must not shift fields
    df = spark.createDataFrame(
        [("alpha\x1ebeta 42",), ("plain 7",)], "line string"
    )
    out = grok(df, match={"line": ["%{DATA:name} %{INT:num}"]})
    got = {r["num"]: r["name"] for r in out.collect()}
    assert got == {"42": "alpha\x1ebeta", "7": "plain"}


def test_no_resume_rebuild_resets_ledger(spark, corpus_dir, tmp_path):
    d = str(tmp_path / "idx")
    r1 = build_index(spark, corpus_dir, d, n_shards=8, units=2, shard_groups=2)
    # rebuild in place with a DIFFERENT unit layout: stale ledger rows and
    # stale unit dirs must not leak into the new build
    r2 = build_index(
        spark, corpus_dir, d, n_shards=8, units=1, shard_groups=1, resume=False
    )
    assert r2.n_docs == r1.n_docs
    assert r2.avgdl == pytest.approx(r1.avgdl)
    stats = spark.read.parquet(f"{d}/corpus_stats").collect()[0]
    assert stats["n_docs"] == r1.n_docs
    chk = spark.read.parquet(f"{d}/postings").select(
        F.expr("bit_xor(xxhash64(term, doc_id, tf))")
    ).collect()[0][0]
    fresh = str(tmp_path / "idx_fresh")
    build_index(spark, corpus_dir, fresh, n_shards=8, units=1, shard_groups=1)
    chk_fresh = spark.read.parquet(f"{fresh}/postings").select(
        F.expr("bit_xor(xxhash64(term, doc_id, tf))")
    ).collect()[0][0]
    assert chk == chk_fresh


def test_hash_collision_detection(spark):
    dic = spark.createDataFrame(
        [(1, "foo"), (1, "bar"), (2, "baz")], "term_hash long, term string"
    )
    bad = hash_collisions(dic).collect()
    assert len(bad) == 1 and bad[0]["term_hash"] == 1
    clean = spark.createDataFrame(
        [(1, "foo"), (1, "foo"), (2, "baz")], "term_hash long, term string"
    )
    assert hash_collisions(clean).count() == 0
