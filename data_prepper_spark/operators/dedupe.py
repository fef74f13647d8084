"""Deduplication suite for training-data pipelines.

Beyond the reference's remove_duplicates action (exact key match,
aggregate-processor/.../RemoveDuplicatesAggregateAction.java:20,25), a
100 TB corpus needs near-duplicate detection. All operators below are
DataFrame programs; the only Python is in deterministic hash mixing that
Spark lacks, kept vectorized via built-in xxhash64 + integer arithmetic.

Scale notes:
- exact dedup: single hash-shuffle on the digest (partial agg first).
- minhash LSH: signatures via groupBy over exploded shingles (partial agg
  computes per-permutation mins map-side); candidate pairs come from a
  self-join on (band_id, band_hash) — the join key is the LSH bucket, so
  the shuffle is tiny compared to an all-pairs cross join. Verification
  joins token sets only for candidates.
- simhash: 64 conditional sums per doc (one groupBy), Hamming-ball match
  via 4-segment pigeonhole blocking (any 16-bit segment equal -> candidate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..util import spread

# 31-bit Mersenne prime: shingle hashes are first reduced mod p, so
# (a*h + b) stays < 2^52 — no int64 overflow under Spark 4 ANSI mode
_P = (1 << 31) - 1


def exact_dedupe(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per exact content digest (deterministic)."""
    return (
        df.withColumn("__digest", F.sha2(F.col(content_col), 256))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__digest")
    )


def shingles(df: DataFrame, content_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingle hashes per doc: (id, shingle_hash).

    Tokenization is materialized in its own projection below the Generate:
    referencing ``toks`` as an attribute keeps the (expensive) analyzer
    expression evaluated once per row instead of once per shingle position
    inside the ``transform`` lambda (CollapseProject leaves multi-referenced
    non-cheap aliases alone).
    """
    toked = spread(df.select(F.col(id_col).alias("id"), tokens_col(content_col).alias("toks")))
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws("", F.slice(toks, i + 1, n))),
    )
    return toked.select("id", F.explode(F.array_distinct(grams)).alias("sh"))


def minhash_signatures(
    sh: DataFrame, num_perm: int = 16
) -> DataFrame:
    """(id, sig array<long>) — min over (a_i*h + b_i) mod p per permutation.

    One exchange: groupBy(id) with partial aggregation computing all mins
    map-side (min of num_perm expressions, no explode of permutations).
    """
    coeffs = [(2 * i + 1, 7919 * (i + 1) + 3) for i in range(num_perm)]  # odd a, fixed b
    h = F.pmod(F.col("sh"), F.lit(_P))
    mins = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded minhash LSH."""
    rows_per_band = num_perm // bands
    sh = shingles(df, content_col, id_col, shingle_n)
    sig = minhash_signatures(sh, num_perm)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws("", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string") for r in range(rows_per_band)])).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bh"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Inverted-index self-join (join on shingle, count common) — the standard
    scalable exact-Jaccard plan; pairs sharing no shingle never meet.
    """
    sh = shingles(df, content_col, id_col, shingle_n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        sh.alias("l")
        .join(sh.alias("r"), "sh")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over token hashes weighted by tf: (id, simhash)."""
    toks = (
        spread(df.select(F.col(id_col).alias("id"), tokens_col(content_col).alias("__toks")))
        .select("id", F.explode("__toks").alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", F.xxhash64("t"))
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(-F.col("w"))
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    acc = F.lit(0).cast("long")
    for b in range(64):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return bit_sums.select("id", acc.alias("simhash"))
