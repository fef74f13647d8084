"""Similarity search over embedding columns (array<float/double>).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector + one JVM-side aggregate expression per row (F.zip_with/aggregate),
then TakeOrderedAndProject — no Python, no shuffle beyond the final top-k.

The scale path is LSH bucketing (random signed projections): each vector
hashes to a bucket; queries probe only matching buckets. At 100 TB the
bucketed table is partitioned by bucket id, so a probe is a partition-
pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (id, sim), ties broken by id ascending."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # cast to double BEFORE multiplying: float32 products accumulate
    # differently than float64 and would break oracle agreement
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col).alias("id"), cosine_sim(v, q).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("id"))
        .limit(k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from splitmix64."""
    import numpy as np

    x = np.arange(dim, dtype=np.uint64) + np.uint64(plane_idx * 0x9E3779B9 + 1)
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
    signs = ((z >> np.uint64(17)) & np.uint64(1)).astype(np.float64) * 2 - 1
    return signs.tolist()


def lsh_bucketed(df: DataFrame, vec_col: str, id_col: str, dim: int, n_planes: int = 8) -> DataFrame:
    """(id, bucket) via random signed projections — the ANN scale path."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bucket = bucket + F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(2**p)).otherwise(0)
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"), F.col(vec_col).alias("vec"))


def lsh_topk(
    bucketed: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Probe the query's LSH bucket only (approximate; partition-prunable)."""
    import numpy as np

    qb = 0
    q = np.array(query_vec)
    for p in range(n_planes):
        if float(np.dot(q, np.array(_hyperplane(dim, p)))) >= 0:
            qb |= 1 << p
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("bucket") == qb)
        .select("id", cosine_sim(F.col("vec"), qcol).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("id"))
        .limit(k)
    )
