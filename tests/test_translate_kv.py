"""translate (regex/map/broadcast) and key_value option coverage —
reference-unit-test style over crafted events."""

from __future__ import annotations

from data_prepper_spark.operators.parse import key_value
from data_prepper_spark.operators.translate import (
    translate_map,
    translate_map_broadcast,
    translate_regex,
)


def test_translate_regex_first_match_wins(spark):
    df = spark.createDataFrame(
        [("GET /api/users",), ("POST /admin/x",), ("PUT /other",)], "req string"
    )
    out = translate_regex(
        df,
        "req",
        "zone",
        {"^GET /api": "api-read", "/admin": "admin", "^GET": "read"},
        default="other",
    )
    got = {r["req"]: r["zone"] for r in out.collect()}
    assert got == {
        "GET /api/users": "api-read",
        "POST /admin/x": "admin",
        "PUT /other": "other",
    }


def test_translate_regex_exact(spark):
    df = spark.createDataFrame([("abc",), ("abcd",)], "s string")
    out = translate_regex(df, "s", "t", {"abc": "hit"}, exact=True, default="miss")
    got = {r["s"]: r["t"] for r in out.collect()}
    assert got == {"abc": "hit", "abcd": "miss"}


def test_translate_map_broadcast_join(spark):
    df = spark.createDataFrame([(1, "us"), (2, "de"), (3, "xx")], "id long, cc string")
    mapping = spark.createDataFrame(
        [("us", "United States"), ("de", "Germany")], "cc string, country string"
    )
    out = translate_map_broadcast(df, "cc", "country", mapping, key="cc", value="country")
    got = {r["id"]: r["country"] for r in out.collect()}
    assert got == {1: "United States", 2: "Germany", 3: None}


def test_translate_map_when_gate(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = translate_map(df, "s", "t", {"a": "A", "b": "B"}, when="id = 1")
    got = {r["id"]: r["t"] for r in out.collect()}
    assert got == {1: "A", 2: None}


def test_key_value_options(spark):
    df = spark.createDataFrame([("A=1;B=2;C=3",)], "kv string")
    out = key_value(
        df,
        "kv",
        destination="m",
        field_split_characters=";",
        value_split_characters="=",
        transform_key="lowercase",
        include_keys=["A", "C"],  # include/exclude match the RAW key,
        # before transform_key — reference executeConfigs order
    ).collect()[0]["m"]
    assert out == {"a": "1", "c": "3"}
