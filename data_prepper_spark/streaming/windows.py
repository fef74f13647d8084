"""Structured Streaming variants of the aggregate actions.

The reference's aggregation windows are processing-time only, with no
late-data semantics (AggregateGroupManager.java:32 — a late event simply
starts a new group). Spark's event-time windows + watermarks are strictly
stronger: we expose the same actions with ``withWatermark`` so late data
within the watermark merges into the correct group instead.

These run against any streaming DataFrame (rate source in tests; kafka in
production: ``spark.readStream.format("kafka")`` replaces the reference's
kafka source/buffer pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_count(
    stream: DataFrame,
    identification_keys: list[str],
    ts: str,
    group_duration: str,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming CountAggregateAction: tumbling event-time window count."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(*identification_keys, F.window(F.col(ts), group_duration).alias("window"))
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            *identification_keys,
            F.col("window.start").alias("start_time"),
            F.col("window.end").alias("end_time"),
            "value",
        )
    )


def windowed_dedupe(
    stream: DataFrame,
    identification_keys: list[str],
    ts: str,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming RemoveDuplicatesAggregateAction:
    dropDuplicatesWithinWatermark keeps the first event per key, with state
    expiry bounded by the watermark (the reference's TTL-cache analog)."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        identification_keys
    )


def windowed_histogram(
    stream: DataFrame,
    identification_keys: list[str],
    key: str,
    buckets: list[float],
    ts: str,
    group_duration: str,
    watermark: str = "0 seconds",
) -> DataFrame:
    bounds = sorted(buckets)
    bucket_idx = F.width_bucket(
        F.col(key), F.lit(float(bounds[0])), F.lit(float(bounds[-1])), F.lit(len(bounds) - 1)
    )
    return (
        stream.withWatermark(ts, watermark)
        .withColumn("bucket", bucket_idx)
        .groupBy(*identification_keys, "bucket", F.window(F.col(ts), group_duration).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.min(key).alias("min"),
            F.max(key).alias("max"),
            F.sum(key).alias("sum"),
        )
    )
