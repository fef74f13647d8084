"""Anomaly detection over grouped numeric keys.

Reference: anomaly_detector processor — per-identification_keys Random Cut
Forest over numeric keys, emitting deviation + grade
(data-prepper-plugins/anomaly-detector-processor/.../
AnomalyDetectorProcessor.java:33,72-90; modes/RandomCutForestMode.java:32,
RandomCutForestModeConfig: shingle_size / sample_size / number_of_trees).

Spark-first design: two modes.

- ``zscore_anomalies``: deterministic robust z-score per group — a pure
  Catalyst plan (one partial-aggregated groupBy for the per-group
  mean/stddev, broadcast back, filter). Fully SQL-expressible, so it is
  oracle-checkable, and at 100 TB it is two scans with map-side combine —
  no state, no UDF.
- ``rcf_anomalies``: the RCF path — a real per-group isolation/random-cut
  forest fit inside ``applyInPandas`` (the reference's per-key forest map
  becomes one pandas group per key; Arrow-batched, numpy-vectorized tree
  evaluation, no external ML dependency). Deterministic: each group's
  forest is seeded from a hash of its key values, so results are stable
  across partitionings and reruns.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
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


def _c_factor(m: int) -> float:
    """Expected path length of an unsuccessful BST search over m points —
    the iForest normalization constant c(m) (Liu et al., ICDM'08)."""
    if m <= 1:
        return 0.0
    if m == 2:
        return 1.0
    h = math.log(m - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (m - 1) / m


def _iforest_scores(
    X: np.ndarray, n_trees: int, sample_size: int, rng: np.random.Generator
) -> np.ndarray:
    """Anomaly score in (0, 1] per row of X (n, d): 2^(-E[h(x)] / c(psi)).

    Each tree is an isolation tree over a random subsample: recursive
    random (dimension, uniform cut) splits until isolation or the depth
    limit; every input point is routed down the SAME splits vectorized
    (boolean masks, no per-point Python), accumulating its depth plus the
    c(m) adjustment of the external node it lands in. This is the
    random-cut scoring core of the reference's RCF (which adds streaming
    model updates; a DataFrame operator scores a bounded batch, so a
    fit-then-score forest is the batch-semantics equivalent).
    """
    n = len(X)
    psi = min(sample_size, n)
    depth_limit = max(1, math.ceil(math.log2(max(psi, 2))))
    depths = np.zeros(n, dtype=np.float64)

    def rec(sample: np.ndarray, ev_idx: np.ndarray, depth: int) -> None:
        if ev_idx.size == 0:
            return
        if len(sample) == 0:
            # rng.uniform(lo, hi) can return exactly lo for tiny spans,
            # leaving one side's sample empty while eval points still
            # route there — treat it as an external node.
            depths[ev_idx] += depth
            return
        spans = sample.max(axis=0) - sample.min(axis=0)
        if depth >= depth_limit or len(sample) <= 1 or not (spans > 0).any():
            depths[ev_idx] += depth + _c_factor(len(sample))
            return
        dims = np.flatnonzero(spans > 0)
        dim = int(dims[rng.integers(len(dims))])
        lo = float(sample[:, dim].min())
        hi = float(sample[:, dim].max())
        cut = rng.uniform(lo, hi)
        smask = sample[:, dim] < cut
        emask = X[ev_idx, dim] < cut
        rec(sample[smask], ev_idx[emask], depth + 1)
        rec(sample[~smask], ev_idx[~emask], depth + 1)

    all_idx = np.arange(n)
    for _ in range(n_trees):
        pick = rng.choice(n, size=psi, replace=False)
        rec(X[pick], all_idx, 0)
    expected = depths / n_trees
    return np.power(2.0, -expected / max(_c_factor(psi), 1e-12))


def rcf_anomalies(
    df: DataFrame,
    identification_keys: list[str],
    value_key: str,
    score_threshold: float = 0.6,
    n_trees: int = 40,
    sample_size: int = 128,
    shingle_size: int = 1,
    order_key: str | None = None,
    max_groups: int = 5000,
    seed: int = 42,
) -> DataFrame:
    """Per-group random-cut-forest anomalies via applyInPandas.

    Emits each scored group's rows whose isolation score exceeds
    ``score_threshold`` (0.5 = indistinguishable from normal, 1.0 =
    isolates immediately), with ``grade = (score - threshold) /
    (1 - threshold)`` in (0, 1] — the reference's anomaly-grade shape.

    ``shingle_size`` > 1 reproduces the reference's time-series shingling
    (RandomCutForestModeConfig.shingleSize): values are ordered by
    ``order_key`` (required then) and each window of ``shingle_size``
    consecutive values becomes one point in R^shingle, flagged on the row
    that COMPLETES the window — a level shift is then visible as a novel
    vector even when each individual value is in range.

    Cardinality cap mirrors the reference's bounded forest map
    (AnomalyDetectorProcessor.java:72-90): only the ``max_groups`` groups
    with the smallest key hashes are scored; rows of every other group
    pass through with ``grade`` null. The threshold hash is found with a
    distributed distinct + TakeOrdered (max_groups rows to the driver's
    1-row agg), so the cap is exact and deterministic — not a
    probabilistic hash-range gate.

    Determinism: each group's forest is seeded from crc32 of its key
    values xor ``seed`` — stable across shuffles, partitionings and
    reruns.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if shingle_size > 1 and order_key is None:
        raise ValueError("shingle_size > 1 requires order_key (window order)")
    keys = list(identification_keys)
    # copy, don't .add(): StructType.add mutates in place, and df.schema is
    # the DataFrame's CACHED schema object — mutating it corrupts every
    # later use of this df (a second rcf_anomalies call would see a
    # phantom 'grade' column)
    out_schema = StructType(list(df.schema.fields) + [StructField("grade", DoubleType())])

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if order_key is not None:
            pdf = pdf.sort_values(order_key, kind="mergesort")
        v = pdf[value_key].astype(float).to_numpy()
        n = len(v)
        if n < shingle_size + 1:
            return pdf.iloc[0:0].assign(grade=np.float64(0))
        if shingle_size > 1:
            X = np.lib.stride_tricks.sliding_window_view(v, shingle_size).astype(
                np.float64
            )
            owners = np.arange(shingle_size - 1, n)  # row completing the window
        else:
            X = v.reshape(-1, 1)
            owners = np.arange(n)
        rng = np.random.default_rng(
            (zlib.crc32("\x1f".join(str(k) for k in key).encode()) ^ seed) & 0xFFFFFFFF
        )
        s = _iforest_scores(X, n_trees, sample_size, rng)
        grade = np.zeros(n, dtype=np.float64)
        grade[owners] = np.maximum(0.0, (s - score_threshold) / (1.0 - score_threshold))
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
