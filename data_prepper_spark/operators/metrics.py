"""OTel metric normalization: the otel_metrics processor family as struct
transforms.

Reference: otel-metrics-raw-processor turns OTLP protobuf into typed
Gauge/Sum/Histogram/Summary events (OTelMetricsRawProcessor.java:36), with
optional histogram bucket calculation; the typed event schemas live in
data-prepper-api (model/metric/JacksonGauge.java, JacksonSum.java —
isMonotonic/aggregationTemporality/value — JacksonHistogram.java — bucket
bounds + counts). The protobuf decode itself is transport (Spark:
``from_protobuf``); what the processor owns is normalization + bucketing,
which is what this module implements columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_gauge_sum(df: DataFrame, kind_col: str = "kind") -> DataFrame:
    """Raw numeric metric rows -> unified gauge/sum schema. Sum rows gain
    isMonotonic + aggregationTemporality defaults (JacksonSum.java);
    gauges pass value through (JacksonGauge.java)."""
    k = F.col(kind_col)
    return df.withColumn(
        "metric",
        F.struct(
            k.alias("kind"),
            F.col("value").cast("double").alias("value"),
            F.when(k == "sum", F.lit(True)).alias("isMonotonic"),
            F.when(k == "sum", F.lit("CUMULATIVE")).alias("aggregationTemporality"),
        ),
    )


def histogram_buckets(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    explicit_bounds: list[float],
) -> DataFrame:
    """Per-group OTel histogram: bucketCounts has len(bounds)+1 entries —
    (-inf, b0], (b0, b1], ..., (bn, +inf) per the OTLP spec the reference
    implements in its bucket calculation — plus min/max/sum/count.

    One partial-aggregated groupBy: the per-bucket counts are conditional
    sums (map-side combined), not an explode."""
    bounds = sorted(explicit_bounds)
    v = F.col(value_key)
    bucket_counts = [
        F.sum(F.when(v <= bounds[0], 1).otherwise(0)).cast("long")
    ]
    for lo, hi in zip(bounds, bounds[1:]):
        bucket_counts.append(F.sum(F.when((v > lo) & (v <= hi), 1).otherwise(0)).cast("long"))
    bucket_counts.append(F.sum(F.when(v > bounds[-1], 1).otherwise(0)).cast("long"))
    return df.groupBy(*identification_keys).agg(
        F.array(*bucket_counts).alias("bucketCounts"),
        F.array(*[F.lit(float(b)) for b in bounds]).alias("explicitBounds"),
        F.min(v).cast("double").alias("min"),
        F.max(v).cast("double").alias("max"),
        F.sum(v).cast("double").alias("sum"),
        F.count(F.lit(1)).alias("count"),
    )


def summary_quantiles(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    quantiles: list[float],
) -> DataFrame:
    """Per-group OTel Summary (JacksonSummary quantile list) via
    percentile_approx — the sketch-based aggregate a cluster-side summary
    needs (exact percentile would sort the world)."""
    return df.groupBy(*identification_keys).agg(
        F.percentile_approx(value_key, quantiles).alias("quantileValues"),
        F.array(*[F.lit(float(q)) for q in quantiles]).alias("quantiles"),
        F.sum(value_key).cast("double").alias("sum"),
        F.count(F.lit(1)).alias("count"),
    )
