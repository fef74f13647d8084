"""OTLP protobuf trace decode: wire bytes -> span rows, no jars.

The reference's otel-proto-common (970 LoC) decodes OTLP protobuf into
Span events for the otel_trace_* sources; Spark's ``from_protobuf`` needs
the external spark-protobuf module, which (like avro) may be absent. The
protobuf wire format is a small public spec (tag = field<<3|wire_type;
varint / fixed64 / length-delimited), and the OTLP trace message layout
is public (opentelemetry-proto trace/v1/trace.proto, collector
ExportTraceServiceRequest), so this module implements the decode in pure
Python — the same approach as the MaxMind reader (operators/mmdb.py).

Scale shape: Arrow-batched ``mapInPandas`` over a binary payload column;
one request payload may fan out to many span rows (mapInPandas yields
variable row counts naturally). Everything per-payload is a tight loop
over bytes — no Spark shuffle is involved until the caller aggregates.

Message fields implemented (numbers from the public .proto):
  ExportTraceServiceRequest: resource_spans = 1
  ResourceSpans:  resource = 1, scope_spans = 2 (also legacy
                  instrumentation_library_spans = 1000)
  Resource:       attributes = 1 (KeyValue)
  ScopeSpans:     spans = 2
  KeyValue:       key = 1, value = 2 (AnyValue)
  AnyValue:       string_value = 1, bool_value = 2, int_value = 3,
                  double_value = 4
  Span:           trace_id = 1 (bytes), span_id = 2, trace_state = 3,
                  parent_span_id = 4, name = 5, kind = 6 (varint),
                  start_time_unix_nano = 7 (fixed64),
                  end_time_unix_nano = 8 (fixed64), attributes = 9,
                  status = 15 (Status: code = 2 varint)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

SPAN_SCHEMA = (
    "traceId string, spanId string, parentSpanId string, name string, "
    "kind int, startTime long, endTime long, durationInNanos long, "
    "serviceName string, statusCode int"
)


# ------------------------------------------------------------ wire reader --
def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Iterate (field_number, wire_type, value) over one message's bytes.
    Length-delimited values come back as slices; varint/fixed as ints."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
            yield fno, wt, v
        elif wt == 1:  # fixed64
            (v,) = struct.unpack_from("<Q", buf, i)
            i += 8
            yield fno, wt, v
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            (v,) = struct.unpack_from("<I", buf, i)
            i += 4
            yield fno, wt, v
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _any_value(buf: bytes):
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            return v.decode("utf-8", "replace")
        if fno == 2:
            return bool(v)
        if fno == 3:
            return int(v)
        if fno == 4:
            return struct.unpack("<d", struct.pack("<Q", v))[0]
    return None


def _attributes(msg: bytes, field_no: int) -> dict:
    out = {}
    for fno, _wt, v in _fields(msg):
        if fno == field_no:
            key = val = None
            for kf, _kw, kv in _fields(v):
                if kf == 1:
                    key = kv.decode("utf-8", "replace")
                elif kf == 2:
                    val = _any_value(kv)
            if key is not None:
                out[key] = val
    return out


def _decode_span(buf: bytes, service: str | None):
    tid = sid = pid = b""
    name, kind, start, end, status = None, 0, 0, 0, 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            tid = v
        elif fno == 2:
            sid = v
        elif fno == 4:
            pid = v
        elif fno == 5:
            name = v.decode("utf-8", "replace")
        elif fno == 6:
            kind = int(v)
        elif fno == 7:
            start = int(v)
        elif fno == 8:
            end = int(v)
        elif fno == 15:
            for sf, _sw, sv in _fields(v):
                if sf == 2:
                    status = int(sv)
    return (
        tid.hex(),
        sid.hex(),
        pid.hex() if pid else None,
        name,
        kind,
        start,
        end,
        end - start,
        service,
        status,
    )


def decode_traces_payload(buf: bytes) -> list[tuple]:
    """One ExportTraceServiceRequest payload -> span tuples (SPAN_SCHEMA
    order). serviceName comes from the resource's 'service.name'
    attribute, the binding the reference's OTelProtoCodec performs."""
    rows = []
    for fno, _wt, rs in _fields(bytes(buf)):
        if fno != 1:  # resource_spans
            continue
        service = None
        scope_msgs = []
        for rf, _rw, rv in _fields(rs):
            if rf == 1:  # resource
                service = _attributes(rv, 1).get("service.name")
            elif rf in (2, 1000):  # scope_spans (legacy ils = 1000)
                scope_msgs.append(rv)
        for sm in scope_msgs:
            for sf, _sw, sv in _fields(sm):
                if sf == 2:  # spans
                    rows.append(_decode_span(sv, service))
    return rows


def decode_otlp_traces(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(payload binary) -> one row per decoded span (SPAN_SCHEMA).
    Arrow-batched; a corrupt payload contributes zero rows rather than
    failing the batch (the reference tags decode failures per request)."""
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = []
            for x in b[payload_col]:
                if x is None:
                    continue
                try:
                    rows.extend(decode_traces_payload(x))
                except Exception:
                    continue
            cols = [c.split(" ")[0] for c in SPAN_SCHEMA.split(", ")]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
            )

    return df.mapInPandas(run, SPAN_SCHEMA)


# --------------------------------------------------- fixture writer (tests) --
def _tag(fno: int, wt: int) -> bytes:
    return _varint((fno << 3) | wt)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _varint(len(payload)) + payload


def _fx64(fno: int, v: int) -> bytes:
    return _tag(fno, 1) + struct.pack("<Q", v)


def encode_traces_payload(service: str, spans: list[dict]) -> bytes:
    """Deterministic ExportTraceServiceRequest encoder (test fixture —
    the writer twin of the decoder, like mmdb.write_mmdb). Span dicts:
    {trace_id, span_id, parent_span_id?, name, kind?, start, end,
    status?} with ids as bytes."""
    kv = _ld(1, b"service.name") + _ld(2, _ld(1, service.encode()))
    resource = _ld(1, kv)
    span_msgs = b""
    for s in spans:
        m = _ld(1, s["trace_id"]) + _ld(2, s["span_id"])
        if s.get("parent_span_id"):
            m += _ld(4, s["parent_span_id"])
        m += _ld(5, s["name"].encode())
        if s.get("kind"):
            m += _tag(6, 0) + _varint(int(s["kind"]))
        m += _fx64(7, int(s["start"])) + _fx64(8, int(s["end"]))
        if s.get("status") is not None:
            m += _ld(15, _tag(2, 0) + _varint(int(s["status"])))
        span_msgs += _ld(2, m)
    scope_spans = span_msgs  # ScopeSpans with spans only
    rs = _ld(1, resource) + _ld(2, scope_spans)
    return _ld(1, rs)
