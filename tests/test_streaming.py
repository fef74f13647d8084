"""Structured Streaming parity: the streaming variants of the aggregate
actions must produce the batch answer on the same (bounded) input.

Uses a file stream source + availableNow trigger so the test is
deterministic and self-terminating — the streaming analog of the
reference's e2e golden tests (e2e-test/log/.../EndToEndBasicLogTest.java).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators import aggregate as agg_ops
from data_prepper_spark.streaming.windows import windowed_count, windowed_dedupe


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    df = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("error")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 600)).alias("ts"),
        )
    )
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, stream_df, out_name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append" if "dedupe" in out_name else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_name)


def test_streaming_windowed_count_matches_batch(spark, stream_input):
    batch = spark.read.parquet(stream_input)
    stream = spark.readStream.schema(batch.schema).parquet(stream_input)
    got = _run_stream(
        spark,
        windowed_count(stream, ["event_type"], "ts", "1 minute"),
        "s_windowed_count",
    ).collect()
    exp = agg_ops.count(
        batch, ["event_type"], ts="ts", group_duration="1 minute"
    ).collect()
    key = lambda r: (r["event_type"], r["start_time"])
    assert sorted([(key(r), r["value"]) for r in got]) == sorted(
        [(key(r), r["value"]) for r in exp]
    )


def test_streaming_dedupe_one_per_key(spark, stream_input):
    batch = spark.read.parquet(stream_input)
    stream = spark.readStream.schema(batch.schema).parquet(stream_input)
    got = _run_stream(
        spark,
        windowed_dedupe(stream, ["user_id", "event_type"], "ts", watermark="1 hour"),
        "s_dedupe",
    ).collect()
    # exactly one survivor per (user_id, event_type) pair present in input
    pairs = [(r["user_id"], r["event_type"]) for r in got]
    assert len(pairs) == len(set(pairs))
    exp_pairs = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert set(pairs) == exp_pairs
