"""Trace processors: the reference's span-stateful operators as joins.

Reference semantics (paths under /root/reference/):
- otel_traces: groups spans by traceId and copies the root span's
  traceGroup + duration/status fields onto every child span
  (data-prepper-plugins/otel-trace-raw-processor/.../
  OTelTraceRawProcessor.java:39,48-52,86 — there a TTL-cached map keyed
  by traceId, flushed on trace_flush_interval).
- service_map: derives service-dependency edges by relating each span to
  its parent across service boundaries (service-map-stateful/.../
  ServiceMapStatefulProcessor.java:42-74,195-209 — there two rotating
  MapDB-backed windows).
- trace_peer_forwarder: shuffles spans by traceId so the stateful ops see
  whole traces (trace-peer-forwarder-processor/...:20).

Spark-first: the per-node TTL caches + MapDB windows + consistent-hash
peer forwarding all collapse into *joins on the trace keys* — the shuffle
IS the peer forwarder (`repartition(traceId)` = the MD5 hash ring,
core:peerforwarder/HashRing.java:30-79), and Catalyst picks
broadcast/sort-merge per side size. Batch mode needs no windows; in
streaming these become windowed stream-stream joins with watermarks
(strictly stronger than the reference's processing-time flush).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOT_FIELDS = ["traceGroup", "endTime", "durationInNanos", "statusCode"]


def fill_trace_group(spans: DataFrame) -> DataFrame:
    """Copy root-span fields onto children missing them (otel_traces).

    Root span = parentSpanId is NULL or empty. Children keep their own
    values when already set (reference only fills missing traceGroup,
    OTelTraceRawProcessor.java:48-52).
    """
    roots = spans.where(
        F.col("parentSpanId").isNull() | (F.col("parentSpanId") == "")
    ).select(
        F.col("traceId").alias("__tid"),
        *[F.col(c).alias(f"__root_{c}") for c in ROOT_FIELDS if c in spans.columns],
    )
    out = spans.join(roots, spans["traceId"] == roots["__tid"], "left")
    for c in ROOT_FIELDS:
        if c in spans.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__root_{c}")))
    return out.drop("__tid", *[f"__root_{c}" for c in ROOT_FIELDS if c in spans.columns])


def service_map_edges(spans: DataFrame) -> DataFrame:
    """Distinct service-dependency edges (service_map).

    child JOIN parent ON child.parentSpanId = parent.spanId AND
    child.serviceName <> parent.serviceName — the relationship the
    reference discovers by probing its two MapDB windows per span
    (ServiceMapStatefulProcessor.java:195-209). The equi-join shuffles
    both sides by spanId once; dropDuplicates keeps the edge set small
    map-side before the final exchange.
    """
    child = spans.select(
        F.col("parentSpanId").alias("__p"), F.col("serviceName").alias("destination")
    ).where(F.col("__p").isNotNull() & (F.col("__p") != ""))
    parent = spans.select(
        F.col("spanId").alias("__s"), F.col("serviceName").alias("source")
    )
    return (
        child.join(parent, child["__p"] == parent["__s"])
        .where(F.col("source") != F.col("destination"))
        .select("source", "destination")
        .dropDuplicates()
    )


def trace_group_lookup(spans: DataFrame, group_index: DataFrame) -> DataFrame:
    """Fill missing traceGroup from an external index (otel_trace_group,
    otel-trace-group-processor/.../OTelTraceGroupProcessor.java:49,120-130
    — there a batched OpenSearch terms query; here a left join against our
    own doc/trace table, broadcast when small)."""
    gi = group_index.select(
        F.col("traceId").alias("__tid"), F.col("traceGroup").alias("__tg")
    )
    out = spans.join(gi, spans["traceId"] == gi["__tid"], "left")
    return out.withColumn(
        "traceGroup", F.coalesce(F.col("traceGroup"), F.col("__tg"))
    ).drop("__tid", "__tg")
