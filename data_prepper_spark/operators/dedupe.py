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
  (``verify_threshold``) joins shingle sets only for candidates and
  computes the exact Jaccard, so the output is deterministic given the
  candidate set.
- exact jaccard: inverted-index self-join with an optional
  ``max_shingle_df`` cutoff (prefix-filter style): a Zipf-hot shingle
  ("the" at shingle_n=1) otherwise creates a near-quadratic join group —
  the one deterministic skew-killer AQE can't split.
- simhash: 64 conditional sums per doc (one groupBy); Hamming matching
  via (h+1)-segment pigeonhole blocking — any pair within Hamming
  distance h agrees exactly on at least one of h+1 disjoint bit
  segments, so a per-segment equi-join finds every such pair without an
  all-pairs comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
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


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for given (id_a, id_b) pairs over shingle sets ``sh``.

    Joins shingles only for the candidate ids (two hash joins keyed on id),
    never all-pairs — candidate cardinality, not corpus size, drives cost.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        pairs.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b) via banded minhash LSH.

    Without ``verify_threshold``: raw candidate pairs (may contain false
    positives; recall is governed by the (num_perm, bands) s-curve).
    With it: candidates are verified with the exact Jaccard over their
    shingle sets and only pairs >= threshold survive — false positives
    are eliminated entirely, so with a band configuration whose miss
    probability at the threshold is negligible (e.g. num_perm=32,
    bands=16: miss ~ (1 - s^2)^16 < 1e-7 at s = 0.8) the output equals
    the exact-Jaccard answer.

    Interaction with ``max_bucket_size``: star edges emitted for oversized
    buckets are exempt from the verification filter (they may carry a
    jaccard below the threshold) — they exist to preserve bucket
    connectivity for clustering consumers, and filtering them would break
    it. Pair-level consumers wanting only >=threshold pairs should treat
    the capped mode's output as a clustering edge list, not a similarity
    listing.
    """
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
    if max_bucket_size is None:
        pairs = (
            banded.alias("l")
            .join(banded.alias("r"), ["band", "bh"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
    else:
        # giant-cluster guard: a bucket of m near-identical docs otherwise
        # emits m(m-1)/2 pairs — at 100 TB one 10^6-copy boilerplate file
        # would produce 5*10^11 rows from a single bucket. Oversized
        # buckets instead emit a STAR to the bucket's min-id
        # representative (m-1 pairs, graph diameter 2, so
        # connected_components still converges in its usual 2-3 rounds):
        # bucket connectivity — hence the clustering — is preserved
        # exactly, while pair-level enumeration inside those buckets is
        # intentionally incomplete (use the cap when pairs feed clustering
        # / keep-set selection, not exhaustive pair listing). One shuffle
        # on (band, bh) — the same key the join uses — computes bucket
        # size and the representative together.
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "bh")
        ranked = banded.select(
            "id", "band", "bh",
            F.count(F.lit(1)).over(w).alias("__sz"),
            F.min("id").over(w).alias("__rep"),
        )
        small = ranked.where(F.col("__sz") <= max_bucket_size).select("id", "band", "bh")
        full_pairs = (
            small.alias("l")
            .join(small.alias("r"), ["band", "bh"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        )
        star_pairs = (
            ranked.where((F.col("__sz") > max_bucket_size) & (F.col("id") != F.col("__rep")))
            .select(F.col("__rep").alias("id_a"), F.col("id").alias("id_b"))
        )
        # Star edges are CONNECTIVITY edges, not similarity claims: they must
        # survive verification unconditionally or an oversized bucket's
        # cluster falls apart whenever a rep-member jaccard dips below the
        # threshold even though member-member pairs would have passed. Track
        # the flag through dedup (a pair that is a star edge in ANY bucket
        # stays exempt — max(bool) keeps it).
        pairs = (
            full_pairs.withColumn("__star", F.lit(False))
            .unionByName(star_pairs.withColumn("__star", F.lit(True)))
            .groupBy("id_a", "id_b")
            .agg(F.max("__star").alias("__star"))
        )
        if verify_threshold is None:
            return pairs.select("id_a", "id_b")
        # LEFT join: jaccard_on_pairs emits no row for pairs with zero
        # common shingles, and a star connectivity edge whose rep/member
        # share none (pure band collision) must still survive — an inner
        # join would drop it despite the __star exemption.
        j = jaccard_on_pairs(pairs.select("id_a", "id_b"), sh)
        return (
            pairs.join(j, ["id_a", "id_b"], "left")
            .withColumn("jaccard", F.coalesce("jaccard", F.lit(0.0)))
            .where((F.col("jaccard") >= verify_threshold) | F.col("__star"))
            .select("id_a", "id_b", "jaccard")
        )
    if verify_threshold is None:
        return pairs
    return jaccard_on_pairs(pairs, sh).where(F.col("jaccard") >= verify_threshold)


def jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 1,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    Inverted-index self-join (join on shingle, count common) — the standard
    scalable exact-Jaccard plan; pairs sharing no shingle never meet.

    ``max_shingle_df`` drops shingles whose document frequency exceeds the
    cutoff BEFORE the self-join (similarity is then over the surviving
    discriminative shingles on both sides of the ratio). This is the
    prefix-filtering idea from set-similarity joins (PPJoin family): a
    single Zipf-hot shingle — df ~ 10^10 for "the" at 100 TB — otherwise
    produces one df^2-row join group, which no AQE skew split can save
    (it's a legitimate, not a mis-partitioned, key). With a cutoff c the
    worst join group is c^2 rows, a constant. Callers needing full-set
    semantics for hot-shingle-only pairs should use the minhash LSH path.
    """
    sh = shingles(df, content_col, id_col, shingle_n)
    if max_shingle_df is not None:
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(dfreq.where(F.col("__df") <= max_shingle_df), "sh").select("id", "sh")
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


def md5_hash60(c: Column) -> Column:
    """60-bit token hash from the first 15 hex chars of md5 — recomputable
    in ANSI SQL (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT), which makes
    simhash signatures oracle-checkable end to end."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash64(
    df: DataFrame,
    content_col: str,
    id_col: str,
    bits: int = 64,
    token_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """``bits``-wide SimHash over token hashes weighted by tf: (id, simhash).

    Default token hash is xxhash64 (JVM-side, fastest); pass
    ``token_hash=md5_hash60`` with ``bits=60`` for an oracle-recomputable
    signature. One groupBy(id) with ``bits`` conditional sums — partial
    aggregation keeps the exchange narrow."""
    h = token_hash(F.col("t")) if token_hash is not None else F.xxhash64("t")
    toks = (
        spread(df.select(F.col(id_col).alias("id"), tokens_col(content_col).alias("__toks")))
        .select("id", F.explode("__toks").alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", h)
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(-F.col("w"))
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return bit_sums.select("id", acc.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    token_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b, hamming) with simhash Hamming distance
    <= max_hamming, via pigeonhole segment blocking.

    The signature is split into ``max_hamming + 1`` disjoint bit segments;
    a pair differing in at most max_hamming bits must agree EXACTLY on at
    least one segment (pigeonhole), so a per-(segment, value) equi-join
    finds every qualifying pair with no all-pairs comparison. The join key
    is the segment value — near-uniform for simhash bits — so the shuffle
    is balanced; the exact Hamming filter (bit_count of xor) then removes
    false candidates.
    """
    n_seg = max_hamming + 1
    assert bits % n_seg == 0, "bits must divide evenly into max_hamming+1 segments"
    seg_bits = bits // n_seg
    mask = (1 << seg_bits) - 1
    sig = simhash64(df, content_col, id_col, bits=bits, token_hash=token_hash)
    seg = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned(F.col("simhash"), s * seg_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("sv"),
                    )
                    for s in range(n_seg)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.seg").alias("seg"), F.col("b.sv").alias("sv"))
    return (
        seg.alias("l")
        .join(seg.alias("r"), ["seg", "sv"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) — component = smallest id reachable through the
    near-dup pair graph. The canonical "which docs are the same document"
    step between pair generation (minhash/simhash/jaccard) and keep-set
    selection: keep id == component, drop the rest.

    Algorithm: iterative min-label propagation over the undirected edge
    list (each round: label(v) = min(label(v), min over neighbors'
    labels)) with a driver-side convergence check on an Observation-free
    count of changed labels. Rounds needed = graph diameter; near-dup
    graphs are unions of small cliques (diameter ~1-2), so this converges
    in 2-3 rounds — the reason plain propagation beats the fancier
    large-star/small-star dance here. Each round is one shuffle
    (groupBy(id) after the edge join); ``localCheckpoint`` every round
    truncates the growing lineage so round N+1 doesn't replay round N.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    if ids is None:
        nodes = edges.select(F.col("src").alias("id")).distinct()
    else:
        nodes = ids.select(F.col(ids.columns[0]).alias("id")).distinct()
    labels = nodes.withColumn("component", F.col("id"))
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
                (F.coalesce(F.col("n_min"), F.col("component")) < F.col("component")).alias("__chg"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where("__chg").limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        # a silently-partial labeling would under-merge clusters; a graph
        # with diameter > max_iterations must fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds; "
            "raise max_iterations (graph diameter exceeds it)"
        )
    return labels
