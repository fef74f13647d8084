"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions over the shared analyzer — one scan computes
everything; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..util import spread

EN_STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "for", "with", "this",
    "that", "it", "on", "as", "are", "be", "or", "an", "at", "by",
]

# tiny deterministic per-language marker sets (n-gram heuristic stand-in)
LANG_MARKERS = {
    "python": ["def", "self", "import", "lambda", "elif"],
    "java": ["public", "static", "void", "extends", "final"],
    "c": ["struct", "sizeof", "typedef", "malloc", "printf"],
    "go": ["func", "chan", "defer", "goroutine", "package"],
    "js": ["function", "const", "var", "typeof", "await"],
    "en": EN_STOPWORDS[:5],
}

# BPE-ish subword pattern: letter runs, digit runs, or single non-space
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _toked(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Materialize the analyzed token array once per row in its own
    projection; downstream refs are attribute reads, so the (expensive)
    analyzer expression is not re-inlined per reference (CollapseProject
    leaves multi-referenced non-cheap aliases alone)."""
    return spread(
        df.select(
            F.col(id_col).alias("id"),
            F.col(content_col).alias("__content"),
            tokens_col(content_col).alias("__toks"),
        )
    )


def text_quality(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features: token counts, length stats, stopword and
    punctuation ratios, BPE-ish subword count."""
    base = _toked(df, content_col, id_col)
    toks = F.col("__toks")
    c = F.col("__content")
    n_tok = F.size(toks)
    return base.select(
        F.col("id"),
        n_tok.alias("n_tokens"),
        F.length(c).alias("n_chars_raw"),
        F.size(F.split(c, r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0))).alias("n_subwords"),
        F.round(
            F.when(n_tok > 0, _count_in(toks, EN_STOPWORDS) / n_tok).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(
                F.length(c) > 0,
                F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / F.length(c),
            ).otherwise(0.0),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tok > 0, F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x) / n_tok).otherwise(0.0),
            6,
        ).alias("avg_token_len"),
        (n_tok < 10).alias("is_short"),
    )


def lang_id(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hit counts,
    ties broken by language name ascending; 'unknown' when zero hits."""
    base = _toked(df, content_col, id_col)
    toks = F.col("__toks")
    scores = F.array(
        *[
            F.struct(
                (-_count_in(toks, words)).alias("neg_hits"), F.lit(lang).alias("lang")
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scores)
    return base.select(
        F.col("id"),
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise("unknown").alias("pred_lang"),
        (-best["neg_hits"]).alias("marker_hits"),
    )


def fingerprint(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Deterministic document fingerprints: md5 of the analyzed token
    stream (content-normalized identity) + a 64-bit rolling hash."""
    base = _toked(df, content_col, id_col)
    toks = F.col("__toks")
    norm = F.concat_ws(" ", toks)
    # rolling polynomial hash mod 2^31-1: operands stay < 2^40 so the
    # arithmetic never overflows long (Spark 4 ANSI mode throws on overflow)
    p31 = F.lit((1 << 31) - 1).cast("long")
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(131).cast("long") + F.pmod(F.xxhash64(t), p31), p31),
    )
    return base.select(
        F.col("id"),
        F.md5(norm).alias("fingerprint_md5"),
        rolling.alias("fingerprint_roll"),
    )
