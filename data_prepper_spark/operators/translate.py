"""Translate processor: dictionary / range enrichment.

Reference: translate-processor/.../TranslateProcessor.java:38,56,197-218 —
maps a source value to a target via exact match, regex, or numeric ranges.

Spark mapping (SURVEY §2.3): small dictionaries inline as a literal
``create_map`` lookup (codegen'd, no join); larger ones broadcast-join a
mapping DataFrame; ranges compile to a chained ``when``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def translate_map(
    df: DataFrame,
    source: str,
    target: str,
    mapping: dict,
    default=None,
    when: str | None = None,
    iterate_on: bool = False,
) -> DataFrame:
    """Exact-match dictionary lookup. With ``iterate_on`` the source is an
    ARRAY column and every element is translated
    (TranslateProcessor.java:197-218's nested-record iteration) — a
    ``transform`` higher-order function, still one codegen'd projection."""
    lit_map = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    if iterate_on:
        col = F.transform(
            F.col(source), lambda x: F.coalesce(lit_map[x], F.lit(default))
        )
    else:
        col = F.coalesce(lit_map[F.col(source)], F.lit(default))
    if when:
        col = F.when(F.expr(when), col)
    return df.withColumn(target, col)


def translate_map_broadcast(
    df: DataFrame, source: str, target: str, mapping_df: DataFrame, key: str, value: str
) -> DataFrame:
    """Large-dictionary variant: broadcast join (geoip-style enrichment —
    geoip-processor/.../GeoIPProcessor.java:34,71-86 maps the same way)."""
    m = mapping_df.select(F.col(key).alias(source), F.col(value).alias(target))
    return df.join(F.broadcast(m), source, "left")


def translate_ranges(
    df: DataFrame,
    source: str,
    target: str,
    ranges: list[tuple[float, float, str]],
    default=None,
    when: str | None = None,
) -> DataFrame:
    """ranges: [(lo_inclusive, hi_exclusive, value)] evaluated in order."""
    col = None
    for lo, hi, val in ranges:
        cond = (F.col(source) >= lo) & (F.col(source) < hi)
        col = F.when(cond, val) if col is None else col.when(cond, val)
    col = col.otherwise(default) if col is not None else F.lit(default)
    if when:
        col = F.when(F.expr(when), col)
    return df.withColumn(target, col)


def translate_regex(
    df: DataFrame,
    source: str,
    target: str,
    patterns: dict[str, str],
    exact: bool = False,
    default=None,
) -> DataFrame:
    """patterns: {regex: value}; first match wins (iteration order)."""
    col = None
    for pat, val in patterns.items():
        rx = f"^(?:{pat})$" if exact else pat
        cond = F.col(source).rlike(rx)
        col = F.when(cond, val) if col is None else col.when(cond, val)
    col = col.otherwise(default) if col is not None else F.lit(default)
    return df.withColumn(target, col)
