"""key_value / grok / csv / translate fidelity options added in round 2
(reference: KeyValueProcessor.java:38-59,232-238, GrokProcessorConfig.java:
14-43, CsvProcessor.java:113-115, TranslateProcessor.java:197-218)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.operators.metrics import summary_quantiles
from data_prepper_spark.operators.parse import csv_parse, grok, grok_expand, key_value
from data_prepper_spark.operators.translate import translate_map
from data_prepper_spark.sources import read_source


def _kv(spark, s, **kw):
    df = spark.createDataFrame([(s,)], "kv string")
    out = key_value(df, source="kv", destination="m", **kw).collect()[0]["m"]
    return dict(out) if out is not None else None


def test_kv_regex_delimiters(spark):
    got = _kv(
        spark, "a:1 ;; b:2 ; c:3",
        field_delimiter_regex=r"\s*;+\s*", key_value_delimiter_regex=":",
    )
    assert got == {"a": "1", "b": "2", "c": "3"}


def test_kv_non_match_and_defaults(spark):
    got = _kv(
        spark, "a=1&orphan",
        non_match_value="N/A", default_values={"env": "prod", "a": "overridden?"},
    )
    # default does NOT overwrite a parsed key; missing key is filled
    assert got == {"a": "1", "orphan": "N/A", "env": "prod"}


def test_kv_exclude_prefix_delete(spark):
    got = _kv(
        spark, "user=alice&pass=secret&x-id=42",
        exclude_keys=["pass"], prefix="p_", delete_key_regex="x-",
    )
    assert got == {"p_user": "alice", "p_id": "42"}


def test_kv_whitespace_strict_and_transform(spark):
    got = _kv(
        spark, "Key = V1&Other =  [v2]",
        whitespace="strict", transform_key="lowercase", remove_brackets=True,
    )
    assert got == {"key": "V1", "other": "v2"}


def test_kv_capitalize_and_duplicates_keep_first(spark):
    got = _kv(spark, "key=1&key=2&other=3", transform_key="capitalize")
    assert got == {"Key": "1", "Other": "3"}


def test_kv_delete_value_regex(spark):
    got = _kv(spark, "a=v-1-2&b=x", delete_value_regex="-[0-9]")
    assert got == {"a": "v", "b": "x"}


def test_grok_syslog_family(spark):
    line = "Oct 11 22:14:15 mymachine su[230]: 'su root' failed for lonvick"
    df = spark.createDataFrame([(line,)], "line string")
    out = grok(df, match={"line": [r"%{SYSLOGBASE} %{GREEDYDATA:msg}"]}).collect()[0]
    assert out["timestamp"] == "Oct 11 22:14:15"
    assert out["logsource"] == "mymachine"
    assert out["program"] == "su"
    assert out["pid"] == "230"
    assert out["msg"] == "'su root' failed for lonvick"


def test_grok_uri_family(spark):
    df = spark.createDataFrame(
        [("fetch https://api.example.com:8443/v1/items?id=7 done",)], "line string"
    )
    out = grok(df, match={"line": [r"fetch %{URI:uri} done"]}).collect()[0]
    assert out["uri"] == "https://api.example.com:8443/v1/items?id=7"
    assert out["port"] == "8443"  # nested named capture inside URIHOST


def test_grok_named_captures_only_false(spark):
    df = spark.createDataFrame([("ip 10.1.2.3 end",)], "line string")
    rx, fields = grok_expand(r"ip %{IP} end", named_captures_only=False)
    assert fields == ["IP"]
    out = grok(df, match={"line": [r"ip %{IP} end"]}, named_captures_only=False).collect()[0]
    assert out["IP"] == "10.1.2.3"
    # default: bare pattern captures nothing
    cols = grok(df, match={"line": [r"ip %{IP} end"]}).columns
    assert "IP" not in cols


def test_grok_keys_to_overwrite(spark):
    df = spark.createDataFrame([("code 42", "keepme")], "line string, status string")
    # status exists: not overwritten unless listed
    kept = grok(df, match={"line": [r"code %{INT:status}"]}).collect()[0]
    assert kept["status"] == "keepme"
    over = grok(
        df, match={"line": [r"code %{INT:status}"]}, keys_to_overwrite=["status"]
    ).collect()[0]
    assert over["status"] == "42"


def test_csv_column_names_from_field(spark):
    df = spark.createDataFrame(
        [("a,b,c", "1,2,3"), ("a,b,c", "4,5,6")], "hdr string, line string"
    )
    out = csv_parse(df, "line", column_names_source_key="hdr")
    rows = {(r["a"], r["b"], r["c"]) for r in out.collect()}
    assert rows == {("1", "2", "3"), ("4", "5", "6")}


def test_translate_iterate_on(spark):
    df = spark.createDataFrame([(["click", "view", "zzz"],)], "evs array<string>")
    out = translate_map(
        df, "evs", "cats", {"click": "ui", "view": "ui"}, default="other", iterate_on=True
    ).collect()[0]
    assert out["cats"] == ["ui", "ui", "other"]


def test_summary_quantiles_vs_duckdb(spark):
    """percentile_approx within tolerance of DuckDB's exact quantiles
    (JacksonSummary analog; VERDICT round-1 gap: zero tests)."""
    import duckdb

    rows = [("g1", float(v)) for v in range(1, 1001)] + [("g2", float(v * 3)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = summary_quantiles(df, ["k"], "v", [0.5, 0.9, 0.99])
    got = {r["k"]: r for r in out.collect()}
    con = duckdb.connect()
    con.execute("create table t (k varchar, v double)")
    con.executemany("insert into t values (?, ?)", rows)
    exact = {
        k: qs
        for k, qs in con.execute(
            "select k, [quantile_cont(v, 0.5), quantile_cont(v, 0.9), quantile_cont(v, 0.99)] "
            "from t group by k"
        ).fetchall()
    }
    for k, r in got.items():
        assert r["count"] == (1000 if k == "g1" else 100)
        for approx, truth in zip(r["quantileValues"], exact[k]):
            assert abs(approx - truth) <= max(2.0, 0.02 * truth), (k, approx, truth)
        assert r["quantiles"] == [0.5, 0.9, 0.99]


def test_avro_codec_gated(spark, tmp_path):
    """Without the spark-avro jar the codec raises a clear capability
    error, not a raw analysis exception (round-1: silently claimed)."""
    df = spark.createDataFrame([(1, "x")], "id int, s string")
    try:
        read_source(spark, str(tmp_path / "nope"), codec="avro")
        has_avro = True
    except NotImplementedError as e:
        has_avro = False
        assert "spark-avro" in str(e)
    except Exception:
        has_avro = True  # jar present; path error is fine
    if has_avro:
        pytest.skip("spark-avro jar available here; gating not exercised")
    with pytest.raises(NotImplementedError):
        from data_prepper_spark.sinks import write_sink

        write_sink(df, str(tmp_path / "out"), codec="avro")


def test_geo_enrich_bucketed_hash_join(spark):
    """/16 bucketing turns the range lookup into a BroadcastHashJoin
    (round-1: BroadcastNestedLoopJoin at city-table scale)."""
    from data_prepper_spark.operators.enrich import geo_enrich

    geo = spark.createDataFrame(
        [
            (int("0A000000", 16), int("0A00FFFF", 16), "US"),   # 10.0.0.0/16
            (int("0A010000", 16), int("0A02FFFF", 16), "DE"),   # 10.1.0.0 - 10.2.255.255 (spans 2 buckets)
        ],
        "net_lo long, net_hi long, country string",
    )
    df = spark.createDataFrame(
        [("10.0.1.2",), ("10.2.200.9",), ("192.168.0.1",)], "ip string"
    )
    out = geo_enrich(df, "ip", geo)
    got = {r["ip"]: r["country"] for r in out.collect()}
    assert got == {"10.0.1.2": "US", "10.2.200.9": "DE", "192.168.0.1": None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan
    # legacy path still correct
    got2 = {r["ip"]: r["country"] for r in geo_enrich(df, "ip", geo, bucketed=False).collect()}
    assert got2 == got


def test_list_to_map_flatten_and_accumulate(spark):
    from data_prepper_spark.operators.mutate import list_to_map

    rows = [([("a", 1), ("b", 2), ("a", 3)],)]
    df = spark.createDataFrame(rows, "kvs array<struct<k string, v int>>")
    last = list_to_map(df, "kvs", "m", "k", "v").collect()[0]["m"]
    assert dict(last) == {"a": 3, "b": 2}
    first = list_to_map(df, "kvs", "m", "k", "v", flattened_element="first").collect()[0]["m"]
    assert dict(first) == {"a": 1, "b": 2}
    acc = list_to_map(df, "kvs", "m", "k", "v", flatten=False).collect()[0]["m"]
    assert {k: list(v) for k, v in acc.items()} == {"a": [1, 3], "b": [2]}


def test_user_agent_extended_families(spark):
    from data_prepper_spark.operators.enrich import user_agent

    rows = [
        ("Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0 Safari/537 Edg/120.0.2210",),
        ("Mozilla/5.0 (X11; Linux) Chrome/118.0 Safari/537 OPR/104.0.4944",),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) CriOS/119.0 Safari/604",),
        ("Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko",),
        ("python-requests/2.31.0",),
        ("Mozilla/5.0 (X11; CrOS x86_64) Chrome/117.0 Safari/537",),
        ("Mozilla/5.0 (Linux; Android 14; Pixel 8) Chrome/120.0 Mobile Safari/537",),
    ]
    df = spark.createDataFrame(rows, "ua string")
    out = [r["user_agent"] for r in user_agent(df, "ua").collect()]
    got = [(o["name"], o["os"]) for o in out]
    assert got == [
        ("Edge", "Windows"),
        ("Opera", "Linux"),
        ("Chrome Mobile iOS", "iOS"),
        ("IE", "Windows"),
        ("Python Requests", "Other"),
        ("Chrome", "Chrome OS"),
        ("Chrome", "Android"),
    ]


def test_kv_recursive_bracket_tree(spark):
    """Recursive mode (KeyValueProcessor.java recurse, round-3): nested
    bracket groups become nested objects; top-level delimiters inside
    brackets do not split; all three bracket families recurse."""
    import json

    from data_prepper_spark.operators.parse import key_value_recursive

    def kv(s, **kw):
        df = spark.createDataFrame([(s,)], "kv string")
        out = key_value_recursive(df, source="kv", destination="m", **kw).collect()[0]["m"]
        return None if out is None else json.loads(out)

    assert kv("item1=[sub1=v1&sub2=v2]&item2=v3") == {
        "item1": {"sub1": "v1", "sub2": "v2"},
        "item2": "v3",
    }
    # deeper nesting + mixed bracket families
    assert kv("a=[b=(c=<d=x>)&e=y]") == {"a": {"b": {"c": {"d": "x"}}, "e": "y"}}
    # delimiters inside brackets don't split the outer level
    assert kv("a=[x=1&y=2]") == {"a": {"x": "1", "y": "2"}}
    # non-match pair takes non_match_value; whitespace shaping matches the
    # reference (key stripTrailing, value leading spaces skipped)
    assert kv("orphan&k = v", field_split_characters="&", non_match_value="N/A") == {
        "orphan": "N/A",
        "k": "v",
    }
    # unbalanced bracket: the open stack never empties, so later
    # delimiters are not top-level and the rest stays one scalar value
    # (matches the reference's stack behavior)
    assert kv("a=[b=1&c=2") == {"a": "[b=1&c=2"}
    # nulls propagate
    df = spark.createDataFrame([(None,)], "kv string")
    out = key_value_recursive(df, source="kv", destination="m").collect()[0]["m"]
    assert out is None
    # recursive mode rejects multi-char / bracket delimiters like the reference
    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_value_recursive(spark.createDataFrame([("x",)], "kv string"), "kv",
                            field_split_characters="&&")


def test_kv_recursive_random_roundtrip(spark):
    """Randomized round-trip battery: serialize random nested dicts into
    the bracket syntax, parse with key_value_recursive, and require exact
    structural equality — covers depth, sibling mixes, and all three
    bracket families far beyond the handwritten cases."""
    import json
    import random

    from data_prepper_spark.operators.parse import key_value_recursive

    rng = random.Random(20260817)
    brackets = ["[]", "()", "<>"]

    def gen(depth):
        n = rng.randint(1, 4)
        d = {}
        for i in range(n):
            k = f"k{depth}{i}{rng.randint(0, 99)}"
            if depth < 3 and rng.random() < 0.45:
                d[k] = gen(depth + 1)
            else:
                d[k] = f"v{rng.randint(0, 999)}"
        return d

    def ser(d):
        parts = []
        for k, v in d.items():
            if isinstance(v, dict):
                b = rng.choice(brackets)
                parts.append(f"{k}={b[0]}{ser(v)}{b[1]}")
            else:
                parts.append(f"{k}={v}")
        return "&".join(parts)

    cases = [gen(0) for _ in range(40)]
    rows = [(i, ser(c)) for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, kv string")
    got = {
        r["i"]: json.loads(r["m"])
        for r in key_value_recursive(df, "kv", "m").collect()
    }
    for i, want in enumerate(cases):
        assert got[i] == want, (i, rows[i][1], got[i], want)
