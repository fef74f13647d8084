"""Analyzer spec: the three renderings (Spark, Python, DuckDB) must agree."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_prepper_spark.analyzer import duckdb_tokens_sql, tokenize_py, tokens_col

CASES = [
    "def fooBar(x): return HTTPServer_v2 + parseJSONResponse  # ünïcödé",
    "SELECT * FROM t WHERE a_b2C >= 10; XMLHttpRequest ALL_CAPS __init__",
    "",
    "   \t\n ",
    "a",
    "camelCase snake_case MiXeD123Case 2Fast2Furious",
    "x" * 5000,
    "_leading __double__ trailing_",
]


def test_python_golden():
    assert tokenize_py("parseJSONResponse") == ["parse", "json", "response"]
    assert tokenize_py("HTTPServer") == ["http", "server"]
    assert tokenize_py("snake_case_id") == ["snake", "case", "id"]
    assert tokenize_py("ALL_CAPS") == ["all", "caps"]
    assert tokenize_py("v2Counter") == ["v2", "counter"]
    assert tokenize_py("a+b==c") == ["a", "b", "c"]
    assert tokenize_py("") == []


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "content string")
    got = [r[0] for r in df.select(tokens_col("content")).collect()]
    assert got == [tokenize_py(s) for s in CASES]


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in CASES:
        got = con.execute(f"select {duckdb_tokens_sql('?::varchar')}", [s]).fetchone()[0]
        assert got == tokenize_py(s), s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
def test_duckdb_matches_python_property(s):
    con = duckdb.connect()
    got = con.execute(f"select {duckdb_tokens_sql('?::varchar')}", [s]).fetchone()[0]
    assert got == tokenize_py(s)
