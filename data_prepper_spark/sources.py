"""Sources & codecs (SURVEY §2.1–2.2) as spark.read wrappers.

The reference's source plugins pair a transport (s3/http/kafka/file) with
an InputCodec (json/ndjson/csv/parquet/avro) and a decompression engine.
Spark folds all three into the DataFrameReader: transport = path scheme
(s3a://, file://), codec = format, decompression = automatic. The scan-
partitioning the s3 source implements by hand
(s3-source/.../S3ScanPartitionCreationSupplier.java:57-108) is Spark's
FileScan partitioning; S3-Select pushdown ≈ Catalyst predicate/column
pushdown into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_source(
    spark: SparkSession,
    path: str,
    codec: str = "parquet",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """codec: parquet | json (array or object-per-file) | ndjson | csv |
    newline (plain text lines) | avro. Compression (gz/snappy) is detected
    from file extensions by Spark."""
    opts = dict(options or {})
    r = spark.read
    if schema:
        r = r.schema(schema)
    if codec == "parquet":
        return r.options(**opts).parquet(path)
    if codec == "json":
        return r.options(multiLine=True, **opts).json(path)
    if codec == "ndjson":
        return r.options(**opts).json(path)
    if codec == "csv":
        return r.options(header=opts.pop("header", "true"), **opts).csv(path)
    if codec == "newline":
        df = r.options(**opts).text(path)
        # reference NewlineDelimitedInputCodec wraps each line as {message}
        return df.withColumnRenamed("value", "message")
    if codec == "avro":
        # spark-avro is an external datasource module; without its jar the
        # load fails with FAILED_TO_FIND_DATA_SOURCE — surface that as a
        # clear capability error instead of a raw analysis exception
        try:
            return r.format("avro").options(**opts).load(path)
        except Exception as e:
            if "FAILED_TO_FIND_DATA_SOURCE" in str(e) or "Failed to find" in str(e):
                raise NotImplementedError(
                    "avro codec requires the spark-avro datasource jar: run with "
                    "spark-submit --packages org.apache.spark:spark-avro_2.13:<spark_version>"
                ) from e
            raise
    raise ValueError(f"unknown codec: {codec}")


def read_stream_source(
    spark: SparkSession,
    transport: str,
    path: str | None = None,
    codec: str = "ndjson",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming twin of ``read_source`` (VERDICT r4 missing #1): the
    reference's continuous listeners — KafkaSource.java:68,
    HTTPSource.java:43, OTelTraceSource.java:52 — map onto
    ``spark.readStream`` transports with the same codec handling.

    transport:
      file   — directory-watching stream over ``path`` (the testable
               transport in this sandbox; also the S3-drop pattern)
      kafka  — ``options`` pass through verbatim (kafka.bootstrap.servers,
               subscribe, startingOffsets, ...); the record ``value`` is
               decoded by ``codec`` via ``decode_stream_payload``.
               Capability-gated: without the spark-sql-kafka jar this
               raises an actionable NotImplementedError (like avro).
      rate   — Spark's synthetic benchmark source.

    Streaming file codecs require an explicit ``schema`` (Structured
    Streaming never infers schemas — a schema change mid-stream would be
    silent corruption)."""
    opts = dict(options or {})
    if transport == "file":
        if path is None:
            raise ValueError("file stream transport requires path")
        r = spark.readStream
        if schema:
            r = r.schema(schema)
        elif codec == "parquet":
            # parquet is self-describing: pin the schema from the files
            # already present at stream start (Structured Streaming
            # refuses to infer per-batch — rightly, a mid-stream schema
            # change would be silent corruption)
            r = r.schema(spark.read.parquet(path).schema)
        elif codec in ("json", "ndjson", "csv"):
            raise ValueError(f"streaming {codec} source requires an explicit schema")
        if codec == "parquet":
            return r.options(**opts).parquet(path)
        if codec in ("json", "ndjson"):
            if codec == "json":
                opts.setdefault("multiLine", "true")
            return r.options(**opts).json(path)
        if codec == "csv":
            return r.options(header=opts.pop("header", "true"), **opts).csv(path)
        if codec == "newline":
            return r.options(**opts).text(path).withColumnRenamed("value", "message")
        raise ValueError(f"unknown stream codec: {codec}")
    if transport == "kafka":
        try:
            raw = spark.readStream.format("kafka").options(**opts).load()
        except Exception as e:
            if "FAILED_TO_FIND_DATA_SOURCE" in str(e) or "Failed to find" in str(e):
                raise NotImplementedError(
                    "kafka transport requires the spark-sql-kafka jar: run with "
                    "spark-submit --packages "
                    "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark_version>"
                ) from e
            raise
        return decode_stream_payload(raw, codec, schema)
    if transport == "rate":
        return spark.readStream.format("rate").options(**opts).load()
    raise ValueError(f"unknown stream transport: {transport!r}")


def decode_stream_payload(
    raw: DataFrame, codec: str = "ndjson", schema: str | None = None
) -> DataFrame:
    """Kafka-record-shaped frame (binary ``value`` + ``timestamp``) ->
    codec-decoded events. Pure column transforms, so it works identically
    on a batch frame (how the tests exercise the kafka decode path
    without the connector jar) and on the live stream."""
    from pyspark.sql import functions as F

    v = F.col("value").cast("string")
    if codec == "newline":
        return raw.select(v.alias("message"), "timestamp")
    if codec in ("json", "ndjson"):
        if not schema:
            raise ValueError("json payload decode requires an explicit schema")
        return raw.select(F.from_json(v, schema).alias("e"), "timestamp").select(
            "e.*", "timestamp"
        )
    if codec == "csv":
        if not schema:
            raise ValueError("csv payload decode requires an explicit schema")
        return raw.select(F.from_csv(v, schema).alias("e"), "timestamp").select(
            "e.*", "timestamp"
        )
    raise ValueError(f"unknown payload codec: {codec}")


def log_generator(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """Deterministic Apache common-log faker (log-generator-source's
    ApacheLogFaker analog; shape from docs/latest_performance_test_results.md:51-55).
    Pure function of the row id — same determinism contract as corpus.py."""
    from pyspark.sql import functions as F

    parts = parallelism or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)
    ip = F.concat_ws(
        ".",
        (F.abs(F.xxhash64("id")) % 223 + 1).cast("string"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 256).cast("string"),
        (F.abs(F.xxhash64("id", F.lit(2))) % 256).cast("string"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 254 + 1).cast("string"),
    )
    user = F.concat(F.lit("user"), (F.col("id") % 97).cast("string"))
    verb = F.element_at(F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT"), F.lit("DELETE")), (F.col("id") % 4 + 1).cast("int"))
    path = F.concat(F.lit("/api/v"), (F.col("id") % 3 + 1).cast("string"), F.lit("/resource/"), (F.col("id") % 1000).cast("string"))
    status = F.element_at(F.array(F.lit(200), F.lit(200), F.lit(200), F.lit(404), F.lit(500)), (F.col("id") % 5 + 1).cast("int"))
    size = F.abs(F.xxhash64("id", F.lit(4))) % 50000
    ts = F.date_format(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400),
        "dd/MMM/yyyy:HH:mm:ss Z",
    )
    log = F.concat(
        ip, F.lit(" - "), user, F.lit(" ["), ts, F.lit('] "'), verb, F.lit(" "),
        path, F.lit(' HTTP/1.0" '), status.cast("string"), F.lit(" "), size.cast("string"),
    )
    return base.select(F.col("id").alias("event_id"), log.alias("log"))
