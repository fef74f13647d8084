"""Small shared utilities for operator plans."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least cluster-parallelism partitions before CPU-heavy
    per-row work.

    At design scale (100 TB, thousands of file splits) the input already
    has >> defaultParallelism partitions and this is a no-op — no shuffle
    is added. The repartition fires only in the pathological small-input /
    big-cluster case (e.g. a single-row-group parquet file on local[32]),
    where one task would otherwise serialize a per-row-expensive pipeline
    (the scan is unsplittable below row-group granularity).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    # only shuffle when parallelism is badly degraded (< half target):
    # a full round-robin exchange of wide content rows costs more than it
    # saves when the scan is already within 2x of cluster parallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)
