"""OTel metric normalization operators (operators/metrics.py)."""

from __future__ import annotations

from data_prepper_spark.operators.metrics import (
    histogram_buckets,
    normalize_gauge_sum,
    summary_quantiles,
)


def test_normalize_gauge_sum(spark):
    df = spark.createDataFrame(
        [("cpu", "gauge", 0.5), ("reqs", "sum", 42.0)], "name string, kind string, value double"
    )
    out = {r["name"]: r["metric"] for r in normalize_gauge_sum(df).collect()}
    assert out["cpu"]["value"] == 0.5 and out["cpu"]["isMonotonic"] is None
    assert out["reqs"]["isMonotonic"] is True
    assert out["reqs"]["aggregationTemporality"] == "CUMULATIVE"


def test_histogram_buckets(spark):
    vals = [(-1.0), 0.0, 1.0, 5.0, 10.0, 11.0, 100.0]
    df = spark.createDataFrame([("m", float(v)) for v in vals], "k string, v double")
    r = histogram_buckets(df, ["k"], "v", [0.0, 10.0]).collect()[0]
    # (-inf,0]=2  (0,10]=3  (10,inf)=2
    assert list(r["bucketCounts"]) == [2, 3, 2]
    assert list(r["explicitBounds"]) == [0.0, 10.0]
    assert r["min"] == -1.0 and r["max"] == 100.0 and r["count"] == 7


def test_summary_quantiles(spark):
    df = spark.createDataFrame([("k", float(v)) for v in range(101)], "k string, v double")
    r = summary_quantiles(df, ["k"], "v", [0.5, 0.99]).collect()[0]
    assert abs(r["quantileValues"][0] - 50.0) <= 1.0
    assert r["count"] == 101 and list(r["quantiles"]) == [0.5, 0.99]
