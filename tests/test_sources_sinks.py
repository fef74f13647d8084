"""Sources/codecs (SURVEY §2.1-2.2) and sinks + quarantine DLQ (§2.9)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from data_prepper_spark.sinks import write_sink, write_with_quarantine
from data_prepper_spark.sources import log_generator, read_source


def test_ndjson_gzip_roundtrip(spark, tmp_path):
    d = str(tmp_path / "gz")
    os.makedirs(d)
    with gzip.open(f"{d}/part.json.gz", "wt") as f:
        for i in range(50):
            f.write(f'{{"id": {i}, "etype": "t{i % 3}"}}\n')
    df = read_source(spark, d, codec="ndjson", schema="id long, etype string")
    assert df.count() == 50
    assert df.where("etype = 't0'").count() == 17


def test_newline_codec_wraps_message(spark, tmp_path):
    d = str(tmp_path / "txt")
    os.makedirs(d)
    with open(f"{d}/log.txt", "w") as f:
        f.write("line one\nline two\n")
    df = read_source(spark, d, codec="newline")
    assert df.columns == ["message"]
    assert sorted(r["message"] for r in df.collect()) == ["line one", "line two"]


def test_csv_sink_roundtrip(spark, tmp_path):
    src = log_generator(spark, 40)
    out = str(tmp_path / "csv_out")
    write_sink(src, out, codec="csv")
    back = read_source(spark, out, codec="csv", schema="event_id long, log string")
    assert back.count() == 40
    assert set(back.columns) == {"event_id", "log"}


def test_partitioned_parquet_sink(spark, tmp_path):
    src = log_generator(spark, 60).withColumn("bucket", F.col("event_id") % 3)
    out = str(tmp_path / "pq_out")
    write_sink(src, out, codec="parquet", partition_by=["bucket"])
    subdirs = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert subdirs == {"bucket=0", "bucket=1", "bucket=2"}
    assert spark.read.parquet(out).count() == 60


def test_quarantine_dlq(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 200), (2, -5), (3, 404), (4, -1)], "id long, status long"
    )
    good, bad = write_with_quarantine(
        df, str(tmp_path / "ok"), "status >= 0", str(tmp_path / "dlq")
    )
    assert (good, bad) == (2, 2)
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert sorted(r["id"] for r in dlq.collect()) == [2, 4]
    assert dlq.columns[-1] == "dlq_reason"
