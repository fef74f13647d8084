"""Sinks (SURVEY §2.9) as DataFrameWriter wrappers.

The opensearch sink — the reference's main output
(opensearch/.../OpenSearchSink.java:316) — is replaced by the native index
build (index/build.py). What remains: file-shaped sinks with codec +
threshold-style partitioning, dynamic "index name" via format strings
(AbstractIndexManager's date-pattern names -> partition columns), and a
quarantine table standing in for the per-document DLQ
(failures-common/.../S3DlqProvider.java:26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sink(
    df: DataFrame,
    path: str,
    codec: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """codec: parquet | json(=ndjson) | csv | avro. partition_by replaces
    the reference's object_key patterns / dated index names — the sink-side
    partitioning the s3 sink buffers by hand (s3-sink/.../ThresholdCheck.java)
    falls out of Spark's committer."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    if codec == "parquet":
        w.parquet(path)
    elif codec == "json":
        w.json(path)
    elif codec == "csv":
        w.option("header", "true").csv(path)
    elif codec == "avro":
        try:
            w.format("avro").save(path)
        except Exception as e:
            if "FAILED_TO_FIND_DATA_SOURCE" in str(e) or "Failed to find" in str(e):
                raise NotImplementedError(
                    "avro codec requires the spark-avro datasource jar: run with "
                    "spark-submit --packages org.apache.spark:spark-avro_2.13:<spark_version>"
                ) from e
            raise
    else:
        raise ValueError(f"unknown codec: {codec}")


def write_with_quarantine(
    df: DataFrame,
    path: str,
    valid_when: str,
    quarantine_path: str,
    codec: str = "parquet",
) -> tuple[int, int]:
    """DLQ analog: rows failing ``valid_when`` land in a quarantine table
    with a reason column; returns (delivered, quarantined) counts."""
    from pyspark.sql import Observation

    cond = F.expr(valid_when)
    good = df.where(cond)
    bad = df.where(~F.coalesce(cond, F.lit(False))).withColumn(
        "dlq_reason", F.lit(f"failed: {valid_when}")
    )
    # counters ride the write jobs as Observation metrics — codec-agnostic
    # and no read-back jobs (re-reading with spark.read.parquet broke for
    # csv/json sinks and cost two extra scans)
    obs_good, obs_bad = Observation(), Observation()
    write_sink(good.observe(obs_good, F.count(F.lit(1)).alias("n")), path, codec)
    write_sink(bad.observe(obs_bad, F.count(F.lit(1)).alias("n")), quarantine_path, codec)
    return int(obs_good.get["n"]), int(obs_bad.get["n"])
