"""YAML pipeline builder: reference-shaped pipelines compile to DataFrames
and produce the same answers as hand-built plans (SURVEY §3.1 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_prepper_spark.pipeline import PipelineRunner

APACHE_YAML = """
log-pipeline:
  source:
    log_generator:
      count: 500
  processor:
    - grok:
        match:
          log: ["%{COMMONAPACHELOG}"]
    - convert_entry_type:
        key: response
        type: integer
    - convert_entry_type:
        key: bytes
        type: integer
    - add_entries:
        entries:
          - key: source_label
            format: "${verb}:${response}"
    - uppercase_string:
        with_keys: [verb]
  routes:
    - errors: "/response >= 400"
    - ok: "/response == 200"
  sink:
    - stdout:
        routes: [errors]
    - pipeline:
        name: error-rollup
error-rollup:
  source:
    pipeline:
      name: log-pipeline
  processor:
    - aggregate:
        identification_keys: [response]
        action:
          count:
            count_key: n
  sink:
    - stdout: {}
"""


@pytest.fixture(scope="module")
def runner(spark):
    return PipelineRunner.from_yaml(spark, APACHE_YAML)


def test_grok_chain_and_routes(spark, runner):
    sinks = runner.sink_frames("log-pipeline")
    errors_df = sinks[0][1]
    rows = errors_df.collect()
    assert len(rows) == 200  # 2 of 5 status values (404, 500) x 500/5
    assert all(r["response"] >= 400 for r in rows)
    assert all(r["verb"] in ("GET", "POST", "PUT", "DELETE") for r in rows)
    assert all(r["source_label"].endswith(str(r["response"])) for r in rows)
    assert all(r["clientip"].count(".") == 3 for r in rows)


def test_pipeline_connector_rollup(spark, runner):
    out = runner.run(write=False)
    rollup = out["error-rollup"][0]
    got = {r["response"]: r["n"] for r in rollup.collect()}
    assert got == {200: 300, 404: 100, 500: 100}


def test_cycle_detection(spark):
    bad = {
        "a": {"source": {"pipeline": {"name": "b"}}, "sink": [{"pipeline": {"name": "b"}}]},
        "b": {"source": {"pipeline": {"name": "a"}}, "sink": [{"stdout": {}}]},
    }
    with pytest.raises(ValueError, match="cycle"):
        PipelineRunner(spark, bad).run(write=False)


def test_file_sink_roundtrip(spark, tmp_path):
    yaml_text = f"""
p1:
  source:
    log_generator:
      count: 100
  processor:
    - grok:
        match:
          log: ["%{{COMMONAPACHELOG}}"]
    - delete_entries:
        with_keys: [log]
  sink:
    - file:
        path: {tmp_path}/out
        codec: parquet
"""
    PipelineRunner.from_yaml(spark, yaml_text).run(write=True)
    back = spark.read.parquet(f"{tmp_path}/out")
    assert back.count() == 100
    assert "clientip" in back.columns and "log" not in back.columns


def test_drop_events_and_obfuscate(spark):
    df = spark.createDataFrame(
        [(1, "ok", "card=1234"), (2, "bad", "card=9876"), (3, "ok", "none")],
        "id long, status string, payload string",
    )
    yaml_text = """
p:
  source:
    dataframe:
      name: input
  processor:
    - drop_events:
        drop_when: '/status == "bad"'
    - obfuscate:
        source: payload
        patterns: ["[0-9]+"]
  sink:
    - stdout: {}
"""
    out = PipelineRunner.from_yaml(spark, yaml_text, dataframes={"input": df}).run(write=False)
    rows = sorted((r["id"], r["payload"]) for r in out["p"][0].collect())
    assert rows == [(1, "card=***"), (3, "none")]


def test_yaml_kv_advanced_options(spark):
    """Round-2 key_value options reach the YAML surface."""
    from data_prepper_spark.pipeline import PipelineRunner

    ev = spark.createDataFrame([("Type :click; uid :7; orphan",)], "msg string")
    model = {
        "p": {
            "source": {"dataframe": {"name": "ev"}},
            "processor": [
                {
                    "key_value": {
                        "source": "msg",
                        "destination": "m",
                        "field_delimiter_regex": r";\s*",
                        "key_value_delimiter_regex": ":",
                        "non_match_value": "missing",
                        "default_values": {"env": "prod"},
                        "whitespace": "strict",
                        "transform_key": "lowercase",
                    }
                }
            ],
            "sink": [{"stdout": {}}],
        }
    }
    out = PipelineRunner(spark, model, dataframes={"ev": ev}).sink_frames("p")[0][1]
    m = dict(out.collect()[0]["m"])
    assert m == {"type": "click", "uid": "7", "orphan": "missing", "env": "prod"}


def test_yaml_grok_syslog_and_list_to_map(spark):
    from pyspark.sql import functions as F

    from data_prepper_spark.pipeline import PipelineRunner

    ev = spark.createDataFrame(
        [("Oct 11 22:14:15 myhost su[230]: done", [("a", "1"), ("a", "2")])],
        "line string, kvs array<struct<k string, v string>>",
    )
    model = {
        "p": {
            "source": {"dataframe": {"name": "ev"}},
            "processor": [
                {"grok": {"match": {"line": ["%{SYSLOGBASE} %{GREEDYDATA:msg}"]}}},
                {"list_to_map": {"source": "kvs", "target": "m", "key": "k",
                                 "value_key": "v", "flattened_element": "first"}},
            ],
            "sink": [{"stdout": {}}],
        }
    }
    out = PipelineRunner(spark, model, dataframes={"ev": ev}).sink_frames("p")[0][1]
    r = out.collect()[0]
    assert r["logsource"] == "myhost" and r["program"] == "su" and r["pid"] == "230"
    assert dict(r["m"]) == {"a": "1"}


def test_yaml_round3_processors(spark):
    """Round-3 YAML surface: key_value recursive mode and anomaly_detector
    in both modes compile and run from a pipeline model."""
    import json

    from data_prepper_spark.pipeline import PipelineRunner

    rows = [(i, "a=[x=1&y=2]&b=3", "g", float(v)) for i, v in enumerate([1, 2, 3, 1000])]
    df = spark.createDataFrame(rows, "id int, message string, k string, v double")
    model = {
        "p": {
            "source": {"dataframe": {"name": "ev"}},
            "processor": [
                {"key_value": {"recursive": True, "destination": "kv"}},
            ],
            "sink": [{"stdout": {}}],
        }
    }
    out = PipelineRunner(spark, model, dataframes={"ev": df}).sink_frames("p")[0][1].collect()
    assert json.loads(out[0]["kv"]) == {"a": {"x": "1", "y": "2"}, "b": "3"}
    model["p"]["processor"] = [
        {"anomaly_detector": {"identification_keys": ["k"], "keys": ["v"],
                              "mode": "random_cut_forest"}}
    ]
    flagged = PipelineRunner(spark, model, dataframes={"ev": df}).sink_frames("p")[0][1].collect()
    assert {r["v"] for r in flagged} == {1000.0}
    model["p"]["processor"] = [
        {"anomaly_detector": {"identification_keys": ["k"], "keys": ["v"],
                              "threshold": 1.0}}
    ]
    z = PipelineRunner(spark, model, dataframes={"ev": df}).sink_frames("p")[0][1].collect()
    assert {r["v"] for r in z} == {1000.0}


def test_r5_registry_trace_metrics_dedupe(spark, tmp_path):
    """r5: geoip / otel_trace_raw / service_map_stateful / otel_metrics /
    dedupe family are reachable from the YAML PROCESSORS registry under
    the reference's plugin names (VERDICT r4 missing #2)."""
    from data_prepper_spark.operators.mmdb import write_mmdb
    from data_prepper_spark.pipeline import PROCESSORS, PipelineRunner

    for name in ("geoip", "otel_traces", "otel_trace_raw", "service_map",
                 "service_map_stateful", "otel_metrics",
                 "otel_metrics_raw_processor", "exact_dedupe",
                 "minhash_dedupe", "simhash_dedupe", "near_dup_clusters"):
        assert name in PROCESSORS, name

    # trace topology: entry -> (raw: fill + geoip, service-map) via YAML
    p = str(tmp_path / "geo.mmdb")
    write_mmdb(p, [("10.0.0.0/8", {"country": {"iso_code": "US"},
                                   "city": {"names": {"en": "Springfield"}}})])
    spans = spark.createDataFrame(
        [("t1", "s1", None, "svcA", "groupX", "10.1.2.3"),
         ("t1", "s2", "s1", "svcB", None, "10.9.9.9"),
         ("t1", "s3", "s2", "svcC", None, "203.0.113.9")],
        "traceId string, spanId string, parentSpanId string, "
        "serviceName string, traceGroup string, ip string",
    )
    model = {
        "entry": {"source": {"dataframe": {"name": "spans"}},
                  "sink": [{"pipeline": {"name": "raw"}},
                           {"pipeline": {"name": "smap"}}]},
        "raw": {"source": {"pipeline": {"name": "entry"}},
                "processor": [
                    {"otel_trace_raw": {}},
                    {"geoip": {"database_path": p,
                               "keys": [{"key": {"source": "ip",
                                                 "target": "client",
                                                 "attributes": ["country_iso_code",
                                                                "city_name"]}}]}}],
                "sink": [{"stdout": {}}]},
        "smap": {"source": {"pipeline": {"name": "entry"}},
                 "processor": [{"service_map_stateful": {}}],
                 "sink": [{"stdout": {}}]},
    }
    runner = PipelineRunner(spark, model, dataframes={"spans": spans})
    raw = {r.spanId: r for r in runner.sink_frames("raw")[0][1].collect()}
    assert raw["s2"].traceGroup == "groupX"  # filled from root
    assert raw["s2"].client_country_iso_code == "US"
    assert raw["s2"].client_city_name == "Springfield"
    assert raw["s3"].client_country_iso_code is None  # miss -> null
    edges = {(r.source, r.destination)
             for r in runner.sink_frames("smap")[0][1].collect()}
    assert edges == {("svcA", "svcB"), ("svcB", "svcC")}

    # metrics + dedupe through YAML
    m = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 9)], "k string, value double")
    model2 = {"p": {"source": {"dataframe": {"name": "m"}},
                    "processor": [{"otel_metrics": {
                        "mode": "histogram", "identification_keys": ["k"],
                        "explicit_bounds": [2.0, 5.0]}}],
                    "sink": [{"stdout": {}}]}}
    h = PipelineRunner(spark, model2, dataframes={"m": m}).sink_frames("p")[0][1].collect()
    assert h[0].bucketCounts == [2, 1, 1] and h[0]["count"] == 4

    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "zz yy xx")],
        "id long, message string")
    model3 = {"p": {"source": {"dataframe": {"name": "d"}},
                    "processor": [{"exact_dedupe": {"source": "message"}}],
                    "sink": [{"stdout": {}}]}}
    kept = PipelineRunner(spark, model3, dataframes={"d": docs}).sink_frames("p")[0][1].collect()
    assert {(r.id, r.dup_count) for r in kept} == {(1, 2), (3, 1)}
    model3["p"]["processor"] = [{"near_dup_clusters": {
        "source": "message", "id_key": "id", "num_perm": 16, "bands": 4,
        "shingle_n": 1}}]
    comp = PipelineRunner(spark, model3, dataframes={"d": docs}).sink_frames("p")[0][1].collect()
    assert {(r.id, r.component) for r in comp} == {(1, 1), (2, 1), (3, 3)}


def test_r5_yaml_stream_source(spark, tmp_path):
    """r5: a YAML pipeline can boot from a streaming source via the
    connector seam — processors compile unchanged, the sink frame is a
    streaming DataFrame the caller triggers; kafka YAML sources raise the
    capability error without the jar."""
    from data_prepper_spark.pipeline import PipelineRunner

    d = tmp_path / "in"
    spark.createDataFrame(
        [(i, "click" if i % 2 else "view", float(i)) for i in range(40)],
        "event_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(d))
    model = {
        "p": {
            "source": {"file_stream": {"path": str(d), "codec": "parquet"}},
            "processor": [
                {"uppercase_string": {"with_keys": ["event_type"]}},
                {"drop_events": {"drop_when": "/value < 10"}},
            ],
            "sink": [{"stdout": {}}],
        }
    }
    sdf = PipelineRunner(spark, model).sink_frames("p")[0][1]
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory").queryName("yaml_stream_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table("yaml_stream_out").collect()
    assert len(rows) == 30  # 40 minus the 10 dropped
    assert {r.event_type for r in rows} == {"CLICK", "VIEW"}

    import pytest as _pytest

    kmodel = {"k": {"source": {"kafka": {"options": {
        "kafka.bootstrap.servers": "localhost:9092", "subscribe": "t"}}},
        "sink": [{"stdout": {}}]}}
    with _pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        PipelineRunner(spark, kmodel).sink_frames("k")
