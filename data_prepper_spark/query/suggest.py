"""Term suggester: "did you mean" over the index dictionary.

The reference's OpenSearch consumers use the _search suggest block
(term suggester) for spell correction; Lucene implements it as a
DirectSpellChecker walk over the term FST. The relational analog: ONE
dictionary scan joined (broadcast) against the query tokens with the
same candidate pruning Lucene applies — first character must match and
the length difference is bounded by the edit budget — then an exact
Levenshtein filter and a per-token top-N window on (distance asc,
frequency desc), which is the term suggester's default sort
(score then freq).

Scale shape: the dictionary scan is term-pruned only by the cheap
first-char/length predicates, so a suggestion request costs one pass
over the dictionary (millions of rows, kilobytes per partition) with the
tokens broadcast — no all-pairs, no per-token job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..analyzer import tokenize_py, tokens_col
from ..tableio import TableIO


def _suggest_core(
    dictionary: DataFrame, tokens: list[str], size: int, max_edits: int
) -> DataFrame:
    """(token, suggestion, distance, df) top-`size` per input token from a
    (term, df) dictionary frame."""
    spark = dictionary.sparkSession
    tok_df = spark.createDataFrame([(t,) for t in sorted(set(tokens))], "token string")
    cand = dictionary.join(
        F.broadcast(tok_df),
        (F.substring("term", 1, 1) == F.substring("token", 1, 1))
        & (F.abs(F.length("term") - F.length("token")) <= max_edits)
        & (F.col("term") != F.col("token"))
        & (F.levenshtein("term", "token") <= max_edits),
    ).select(
        "token",
        F.col("term").alias("suggestion"),
        F.levenshtein("term", "token").alias("distance"),
        "df",
    )
    w = Window.partitionBy("token").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
        .select("token", F.col("rank").cast("int").alias("rank"),
                "suggestion", "distance", "df")
    )


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    text: str,
    size: int = 5,
    max_edits: int = 2,
) -> DataFrame:
    """Suggestions for every analyzed token of ``text`` from the built
    index's dictionary (base + layered side dictionaries via dict_df, so
    NRT segments contribute candidates too)."""
    from .common import dict_df

    io = TableIO(index_dir)
    return _suggest_core(
        dict_df(spark, io).select("term", "df"), tokenize_py(text), size, max_edits
    )


def suggest_terms_adhoc(
    df: DataFrame,
    text_col: str,
    text: str,
    size: int = 5,
    max_edits: int = 2,
) -> DataFrame:
    """Index-free twin: the dictionary is computed from the corpus with
    the same analyzer (one tokenize + distinct-per-doc + groupBy — the
    document-frequency definition the index build uses)."""
    d = (
        df.select(F.explode(F.array_distinct(tokens_col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return _suggest_core(d, tokenize_py(text), size, max_edits)
