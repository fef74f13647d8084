"""Anomaly detection over grouped numeric keys.

Reference: anomaly_detector processor — per-identification_keys Random Cut
Forest over numeric keys, emitting deviation + grade
(data-prepper-plugins/anomaly-detector-processor/.../
AnomalyDetectorProcessor.java:33,72-90; modes/RandomCutForestMode.java:32).

Spark-first design: two modes.

- ``zscore_anomalies``: deterministic robust z-score per group — a pure
  Catalyst plan (one partial-aggregated groupBy for the per-group
  mean/stddev, broadcast back, filter). Fully SQL-expressible, so it is
  oracle-checkable, and at 100 TB it is two scans with map-side combine —
  no state, no UDF.
- ``rcf_anomalies``: the RCF-shaped path — per-group model fit inside
  ``applyInPandas`` (the reference's per-key forest map becomes one
  pandas group per key). The model here is a deterministic isolation
  proxy (quantile-based), keeping the sandbox dependency-free while the
  Spark-side contract (grouping, cardinality cap, schema) matches what a
  real RCF library would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_anomalies(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose |value - group mean| / group stddev > threshold, with the
    deviation attached. Groups with zero variance emit nothing."""
    stats = df.groupBy(*identification_keys).agg(
        F.avg(value_key).alias("__mu"),
        F.stddev_pop(value_key).alias("__sigma"),
    )
    out = df.join(F.broadcast(stats), identification_keys)
    z = (F.col(value_key) - F.col("__mu")) / F.col("__sigma")
    return (
        out.where((F.col("__sigma") > 0) & (F.abs(z) > threshold))
        .withColumn("deviation", z)
        .drop("__mu", "__sigma")
    )


def rcf_anomalies(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    quantile: float = 0.99,
    max_groups: int = 5000,
) -> DataFrame:
    """Per-group quantile-isolation anomalies via applyInPandas.

    Cardinality cap mirrors the reference's bounded forest map
    (AnomalyDetectorProcessor.java:72-90): only the ``max_groups`` groups
    with the smallest key hashes are scored; rows of every other group
    pass through with ``grade`` null. The threshold hash is found with a
    distributed distinct + TakeOrdered (max_groups rows to the driver's
    1-row agg), so the cap is exact and deterministic — not a
    probabilistic hash-range gate.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    keys = list(identification_keys)
    # copy, don't .add(): StructType.add mutates in place, and df.schema is
    # the DataFrame's CACHED schema object — mutating it corrupts every
    # later use of this df (a second rcf_anomalies call would see a
    # phantom 'grade' column)
    out_schema = StructType(list(df.schema.fields) + [StructField("grade", DoubleType())])

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_key].astype(float)
        lo, hi = v.quantile(1 - quantile), v.quantile(quantile)
        spread_ = max(hi - lo, 1e-12)
        grade = ((v - hi).clip(lower=0) + (lo - v).clip(lower=0)) / spread_
        res = pdf.copy()
        res["grade"] = grade
        return res[res["grade"] > 0]

    gh = F.xxhash64(*keys)
    threshold_row = (
        df.select(*keys).distinct().select(gh.alias("__gh"))
        .orderBy("__gh").limit(max_groups)
        .agg(F.max("__gh").alias("th"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    if threshold_row["n"] is None or threshold_row["n"] < max_groups:
        return df.groupBy(*keys).applyInPandas(score, out_schema)
    scored = (
        df.where(gh <= threshold_row["th"])
        .groupBy(*keys)
        .applyInPandas(score, out_schema)
    )
    passthrough = df.where(gh > threshold_row["th"]).withColumn(
        "grade", F.lit(None).cast("double")
    )
    return scored.unionByName(passthrough)
