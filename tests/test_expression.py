"""Data Prepper expression language -> Spark SQL transpiler
(data_prepper_spark/expression.py), mirroring the reference's
GenericExpressionEvaluator_ConditionalIT operator/typing sweeps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_prepper_spark import expression


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, 200, "GET /api", "10.1.2.3", ["a", "b"], 1.5),
            (2, 404, "POST /x", "192.168.0.9", ["b"], 0.0),
            (3, 500, "GET /err", "8.8.8.8", [], -2.0),
        ],
        "id long, status_code long, msg string, ip string, tags array<string>, v double",
    )


def _ids(ev, stmt):
    return sorted(r["id"] for r in ev.where(expression.evaluate(stmt)).collect())


def test_comparison_and_logic(ev):
    assert _ids(ev, "/status_code == 200") == [1]
    assert _ids(ev, "/status_code != 200") == [2, 3]
    assert _ids(ev, "/status_code >= 404 and /status_code < 500") == [2]
    assert _ids(ev, "/status_code == 200 or /status_code == 500") == [1, 3]
    assert _ids(ev, "not (/status_code == 200)") == [2, 3]


def test_regex_and_sets(ev):
    assert _ids(ev, '/msg =~ "^GET"') == [1, 3]
    assert _ids(ev, '/msg !~ "^GET"') == [2]
    assert _ids(ev, "/status_code in {200, 404}") == [1, 2]
    assert _ids(ev, "/status_code not in {200, 404}") == [3]


def test_arithmetic_and_functions(ev):
    assert _ids(ev, "/v * 2 > 1") == [1]
    assert _ids(ev, "/status_code + 100 == 300") == [1]
    assert _ids(ev, "length(/msg) == 8") == [1, 3]
    assert _ids(ev, 'contains(/msg, "api")') == [1]


def test_hastags_and_cidr(ev):
    assert _ids(ev, 'hasTags("a", "b")') == [1]
    assert _ids(ev, 'hasTags("b")') == [1, 2]
    assert _ids(ev, 'cidrContains(/ip, "10.0.0.0/8")') == [1]
    assert _ids(ev, 'cidrContains(/ip, "10.0.0.0/8", "192.168.0.0/16")') == [1, 2]


def test_nested_pointer(spark):
    df = spark.createDataFrame(
        [(1, {"buzz": 5}), (2, {"buzz": 9})], "id long, fizz struct<buzz: long>"
    )
    got = sorted(
        r["id"] for r in df.where(expression.evaluate("/fizz/buzz > 6")).collect()
    )
    assert got == [2]
