"""Code-aware analyzer: one tokenization spec, three renderings.

Spec (applied in exactly this order — all three renderings MUST match):

  1. Replace every maximal run of characters outside ``[A-Za-z0-9_]``
     with a single space.                       (punctuation/operators out)
  2. Insert a space between a lowercase-or-digit and an uppercase char:
     ``([a-z0-9])([A-Z])`` -> ``\\1 \\2``        (camelCase -> camel Case)
  3. Insert a space between an uppercase run and an Upper-lower pair:
     ``([A-Z]+)([A-Z][a-z])`` -> ``\\1 \\2``      (HTTPServer -> HTTP Server)
  4. Lowercase.
  5. Split on runs of space or underscore; drop empty strings.

The result is the token list in document order; ``doc_len`` is its size.

Rendering 1 (engine hot path) is pure Spark SQL expressions — whole-stage
codegen, zero Python. The reference does this per-event in Java regex
(grok-processor/.../GrokProcessor.java:120-136 is the analogous regex
machinery); we do it columnar.

Rendering 2 (tests/oracle.py imports ``tokenize_py``) is plain Python ``re``.

Rendering 3 (``duckdb_tokens_sql``) renders the same pipeline as a DuckDB SQL
fragment for the driver's oracle comparisons.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) pairs: Java/Spark uses $1, Python/DuckDB use \1.
_RULE1 = ("([a-z0-9])([A-Z])", r"$1 $2")
_RULE2 = ("([A-Z]+)([A-Z][a-z])", r"$1 $2")
_NON_WORD = "[^A-Za-z0-9_]+"
_SPLIT = "[ _]+"


def tokens_col(content: Column | str) -> Column:
    """array<string> of analyzed tokens, document order. Pure built-ins."""
    c = F.col(content) if isinstance(content, str) else content
    s = F.regexp_replace(c, _NON_WORD, " ")
    s = F.regexp_replace(s, _RULE1[0], _RULE1[1])
    s = F.regexp_replace(s, _RULE2[0], _RULE2[1])
    s = F.lower(s)
    arr = F.split(s, _SPLIT)
    return F.filter(arr, lambda x: x != F.lit(""))


def doc_len_col(content: Column | str) -> Column:
    """int token count under the analyzer spec."""
    return F.size(tokens_col(content))


_P1 = re.compile(_NON_WORD)
_P2 = re.compile(_RULE1[0])
_P3 = re.compile(_RULE2[0])
_P4 = re.compile(_SPLIT)


def tokenize_py(text: str) -> list[str]:
    """Pure-Python rendering of the exact same spec (for the oracle)."""
    s = _P1.sub(" ", text)
    s = _P2.sub(r"\1 \2", s)
    s = _P3.sub(r"\1 \2", s)
    s = s.lower()
    return [t for t in _P4.split(s) if t]


def duckdb_tokens_sql(col: str) -> str:
    """DuckDB SQL expression producing list<varchar> of analyzed tokens."""
    return (
        "list_filter(string_split_regex(lower("
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        "'[^A-Za-z0-9_]+', ' ', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g'), "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g')), "
        "'[ _]+'), x -> x <> '')"
    )
