"""applyInPandasWithState operators: cross-micro-batch state accumulation
(maxFilesPerTrigger=1 forces one micro-batch per input file) and the
processing-time group-conclude path."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.streaming.stateful import (
    stateful_group_count,
    stateful_running_count,
)


@pytest.fixture(scope="module")
def two_batch_input(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_in"))
    # file 0: keys a=3, b=1 ; file 1: a=2, b=2, c=1
    rows0 = [("a",)] * 3 + [("b",)]
    rows1 = [("a",)] * 2 + [("b",)] * 2 + [("c",)]
    spark.createDataFrame(rows0, "k string").coalesce(1).write.parquet(f"{d}/f0")
    spark.createDataFrame(rows1, "k string").coalesce(1).write.parquet(f"{d}/f1")
    # flatten into one dir of two files
    import glob
    import shutil

    out = str(tmp_path_factory.mktemp("stateful_flat"))
    for i, sub in enumerate(("f0", "f1")):
        src = glob.glob(f"{d}/{sub}/part-*.parquet")[0]
        shutil.copy(src, f"{out}/{i:03d}.parquet")
    return out


def test_running_count_across_microbatches(spark, two_batch_input):
    schema = "k string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_input)
    )
    q = (
        stateful_running_count(stream, ["k"], "n")
        .writeStream.format("memory")
        .queryName("s_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [(r["k"], r["n"]) for r in spark.table("s_running").collect()]
    # cumulative totals must appear: a reaches 5, b reaches 3, c reaches 1
    finals = {}
    for k, n in rows:
        finals[k] = max(finals.get(k, 0), n)
    assert finals == {"a": 5, "b": 3, "c": 1}
    # state crossed micro-batches: 'a' and 'b' each emit an intermediate
    # total below their final one (file order is mtime-dependent, so only
    # monotone growth is asserted, not which file ran first)
    for key in ("a", "b"):
        assert any(k == key and n < finals[key] for k, n in rows), rows


def test_group_count_concludes_on_timeout(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 40).load()
        .select((F.col("value") % 2).alias("k"))
    )
    out = stateful_group_count(stream, ["k"], group_duration_ms=2000, count_key="value")
    q = (
        out.writeStream.format("memory")
        .queryName("s_conclude")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 45
        rows = []
        while time.time() < deadline:
            rows = spark.table("s_conclude").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows, "no group concluded within 45s"
    assert all(r["value"] > 0 for r in rows)
