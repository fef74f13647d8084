"""Aggregate processor actions as windowed group-bys.

The reference's `aggregate` processor (aggregate-processor/.../
AggregateProcessor.java:29,82-127) hashes identification_keys to a group,
holds per-group state, and emits on group_duration expiry — a processing-
time window plus a consistent-hash shuffle (RequiresPeerForwarding). In
Spark that is exactly ``groupBy(keys, window(ts, duration))`` with the
exchange handled by the planner; partial aggregation makes hot groups cheap.

Each action below mirrors one AggregateAction implementation
(aggregate-processor/.../actions/*.java). Batch DataFrame versions here;
streaming variants (withWatermark) in streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _grouped(df: DataFrame, keys: list[str], ts: str | None, duration: str | None):
    cols = [F.col(k) for k in keys]
    if ts and duration:
        w = F.window(F.col(ts), duration)
        return df.groupBy(*cols, w.alias("window")), True
    return df.groupBy(*cols), False


def count(
    df: DataFrame,
    identification_keys: list[str],
    ts: str | None = None,
    group_duration: str | None = None,
    count_key: str = "value",
) -> DataFrame:
    """CountAggregateAction.java:37,83,99 — per-group event count with
    window start/end when a duration is given."""
    g, windowed = _grouped(df, identification_keys, ts, group_duration)
    out = g.agg(F.count(F.lit(1)).alias(count_key))
    if windowed:
        out = out.select(
            *identification_keys,
            F.col("window.start").alias("start_time"),
            F.col("window.end").alias("end_time"),
            count_key,
        )
    return out


def histogram(
    df: DataFrame,
    identification_keys: list[str],
    key: str,
    buckets: list[float],
    ts: str | None = None,
    group_duration: str | None = None,
) -> DataFrame:
    """HistogramAggregateAction.java:42,133,190 — explicit-bound histogram
    + min/max/sum/count per group. width_bucket is JVM-side."""
    bounds = sorted(buckets)
    bucket_idx = F.width_bucket(
        F.col(key), F.lit(float(bounds[0])), F.lit(float(bounds[-1])), F.lit(len(bounds) - 1)
    )
    with_b = df.withColumn("bucket", bucket_idx)
    keys = [*identification_keys, "bucket"]
    if ts and group_duration:
        keys.append(F.window(F.col(ts), group_duration).alias("window"))
    return with_b.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("bucket_count"),
        F.min(key).alias("min"),
        F.max(key).alias("max"),
        F.sum(key).alias("sum"),
    )


def put_all(df: DataFrame, identification_keys: list[str], order_by: str) -> DataFrame:
    """PutAllAggregateAction.java:25-37 — merge group members, last writer
    wins. Deterministic via max_by on the order column (the reference's
    arrival order is nondeterministic; we pin it)."""
    value_cols = [c for c in df.columns if c not in identification_keys]
    aggs = [F.max_by(c, order_by).alias(c) for c in value_cols]
    return df.groupBy(*identification_keys).agg(*aggs)


def append(df: DataFrame, identification_keys: list[str], keys_to_append: list[str]) -> DataFrame:
    """AppendAggregateAction.java:33,51,82 — conflicting values collect into
    arrays (sorted for determinism)."""
    aggs = [F.sort_array(F.collect_list(c)).alias(c) for c in keys_to_append]
    return df.groupBy(*identification_keys).agg(*aggs)


def remove_duplicates(df: DataFrame, identification_keys: list[str], order_by: str) -> DataFrame:
    """RemoveDuplicatesAggregateAction.java:20,25 — keep first event per
    group. 'First' pinned to min(order_by) (+ remaining cols via min_by)."""
    w = Window.partitionBy(*identification_keys).orderBy(*[F.col(order_by).asc()] if isinstance(order_by, str) else order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).where("__rn = 1").drop("__rn")
    )


def percent_sampler(df: DataFrame, identification_keys: list[str], percent: float, order_by: str) -> DataFrame:
    """PercentSamplerAggregateAction.java:21,33 — allow `percent`% of events
    per group by running count: rank/total <= percent/100."""
    w = Window.partitionBy(*identification_keys).orderBy(order_by)
    wc = Window.partitionBy(*identification_keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .where(F.col("__rn") <= F.ceil(F.col("__n") * percent / 100.0))
        .drop("__rn", "__n")
    )


def tail_sampler(
    df: DataFrame,
    identification_keys: list[str],
    error_condition: str,
    percent: float,
    order_by: str,
) -> DataFrame:
    """TailSamplerAggregateAction.java:29,53,74 — emit ALL events of a group
    iff any member satisfies the error condition, else sample groups at
    `percent`% (pinned: hash of keys modulo 100 < percent)."""
    wc = Window.partitionBy(*identification_keys)
    has_err = F.max(F.when(F.expr(error_condition), 1).otherwise(0)).over(wc)
    bucket = F.pmod(F.xxhash64(*identification_keys), F.lit(100))
    return (
        df.withColumn("__err", has_err)
        .where((F.col("__err") == 1) | (bucket < F.lit(int(percent))))
        .drop("__err")
    )


def rate_limiter(
    df: DataFrame,
    identification_keys: list[str],
    events_per_second: int,
    ts: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """RateLimiterAggregateAction.java:22,35 (drop mode) — keep at most
    events_per_second per group per 1-second window. ``tiebreakers`` pin
    which events survive when several share a timestamp (the reference
    keeps arrival order, which is nondeterministic across runs)."""
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*identification_keys, F.window(F.col(ts), "1 second")).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= events_per_second).drop("__rn")
