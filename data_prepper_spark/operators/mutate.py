"""Mutate-event / mutate-string processors as DataFrame transforms.

Reference semantics (paths under /root/reference/data-prepper-plugins/):
- add_entries      mutate-event-processors/.../AddEntryProcessor.java:27,42-77
- copy_values      mutate-event-processors/.../CopyValueProcessor.java:21,35
- rename_keys      mutate-event-processors/.../RenameKeyProcessor.java:21,35
- delete_entries   mutate-event-processors/.../DeleteEntryProcessor.java:20,36
- convert_entry_type  mutate-event-processors/.../ConvertEntryTypeProcessor.java:27,55
- list_to_map      mutate-event-processors/.../ListToMapProcessor.java:30,47-83
- lowercase/uppercase/trim  mutate-string-processors/.../*StringProcessor.java
- split_string     mutate-string-processors/.../SplitStringProcessor.java:20,49-63
- substitute_string mutate-string-processors/.../SubstituteStringProcessor.java:26,41-49

Every processor takes an optional ``when`` Spark-SQL predicate string — the
analog of the reference's ``*_when`` expression gate (evaluated per event,
e.g. AddEntryProcessor.java:48). Rows failing the gate pass through with the
transform skipped (expressed as ``when(cond, new).otherwise(old)``, which
Catalyst folds into the projection — no branch in the plan, no shuffle).

The reference mutates a per-event JSON tree; we produce a new column set.
Columnar + codegen replaces per-row Jackson tree edits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPE_MAP = {  # ConvertEntryTypeProcessor TargetType.java:19-23
    "integer": "long",
    "string": "string",
    "double": "double",
    "boolean": "boolean",
}


def _gated(df: DataFrame, key: str, new: Column, when: str | None) -> DataFrame:
    if when is None:
        return df.withColumn(key, new)
    old = F.col(key) if key in df.columns else F.lit(None).cast("string")
    return df.withColumn(key, F.when(F.expr(when), new).otherwise(old))


def add_entries(df: DataFrame, entries: list[dict], when: str | None = None) -> DataFrame:
    """entries: [{key, value | format | value_expression, overwrite_if_key_exists}].

    ``format`` uses ``${col}`` interpolation (JacksonEvent.formatString,
    JacksonEvent.java:305-377); ``value_expression`` is a SQL expression.
    """
    for e in entries:
        key = e["key"]
        if "value" in e:
            col = F.lit(e["value"])
        elif "format" in e:
            fmt = e["format"]
            parts: list[Column] = []
            rest = fmt
            while "${" in rest:
                pre, _, tail = rest.partition("${")
                name, _, rest = tail.partition("}")
                if pre:
                    parts.append(F.lit(pre))
                parts.append(F.col(name).cast("string"))
            if rest:
                parts.append(F.lit(rest))
            col = F.concat(*parts) if parts else F.lit("")
        else:
            col = F.expr(e["value_expression"])
        if key in df.columns and not e.get("overwrite_if_key_exists", False):
            col = F.coalesce(F.col(key), col)
        df = _gated(df, key, col, when)
    return df


def copy_values(df: DataFrame, entries: list[dict], when: str | None = None) -> DataFrame:
    """entries: [{from_key, to_key, overwrite_if_to_key_exists}]."""
    for e in entries:
        col = F.col(e["from_key"])
        if e["to_key"] in df.columns and not e.get("overwrite_if_to_key_exists", False):
            col = F.coalesce(F.col(e["to_key"]), col)
        df = _gated(df, e["to_key"], col, when)
    return df


def rename_keys(df: DataFrame, entries: list[dict]) -> DataFrame:
    """entries: [{from_key, to_key}]."""
    for e in entries:
        df = df.withColumnRenamed(e["from_key"], e["to_key"])
    return df


def delete_entries(df: DataFrame, with_keys: list[str]) -> DataFrame:
    return df.drop(*with_keys)


def convert_entry_type(df: DataFrame, key: str, type_: str, when: str | None = None) -> DataFrame:
    return _gated(df, key, F.col(key).cast(_TYPE_MAP[type_]), when)


def list_to_map(
    df: DataFrame,
    source: str,
    target: str,
    key_name: str,
    value_key: str | None = None,
    flatten: bool = True,
    flattened_element: str = "last",
) -> DataFrame:
    """Array-of-structs -> map keyed by ``key_name`` (ListToMapProcessor.java:
    105-115).

    value_key=None keeps the whole struct as the value. Duplicate keys:
    with ``flatten`` the 'first' or 'last' occurrence wins (reference
    FlattenedElement semantics; map_from_entries alone would THROW under
    Spark's default dedup policy); with ``flatten=False`` values
    accumulate into arrays per key, the reference's default
    list-accumulation shape (our default stays flatten=True because a
    map<string, scalar> is the shape downstream column references use).
    """
    val = (lambda x: x[value_key]) if value_key else (lambda x: x)
    src = F.col(source)
    keys = F.transform(src, lambda x: x[key_name])
    if not flatten:
        uniq = F.array_distinct(keys)
        vals = F.transform(
            uniq,
            lambda k: F.transform(F.filter(src, lambda x: x[key_name] == k), val),
        )
        return df.withColumn(target, F.map_from_arrays(uniq, vals))
    if flattened_element == "first":
        pick = lambda x, i: F.array_position(keys, x[key_name]) == i + 1
    else:
        assert flattened_element == "last", flattened_element
        rev_pos = lambda x: F.size(keys) - F.array_position(F.reverse(keys), x[key_name]) + 1
        pick = lambda x, i: rev_pos(x) == i + 1
    entries = F.filter(src, pick)
    pairs = F.transform(
        entries, lambda x: F.struct(x[key_name].alias("key"), val(x).alias("value"))
    )
    return df.withColumn(target, F.map_from_entries(pairs))


def lowercase_string(df: DataFrame, with_keys: list[str], when: str | None = None) -> DataFrame:
    for k in with_keys:
        df = _gated(df, k, F.lower(F.col(k)), when)
    return df


def uppercase_string(df: DataFrame, with_keys: list[str], when: str | None = None) -> DataFrame:
    for k in with_keys:
        df = _gated(df, k, F.upper(F.col(k)), when)
    return df


def trim_string(df: DataFrame, with_keys: list[str], when: str | None = None) -> DataFrame:
    for k in with_keys:
        df = _gated(df, k, F.trim(F.col(k)), when)
    return df


def split_string(df: DataFrame, entries: list[dict], when: str | None = None) -> DataFrame:
    """entries: [{source, delimiter | delimiter_regex}] — splits in place."""
    import re as _re

    for e in entries:
        pat = e.get("delimiter_regex") or _re.escape(e["delimiter"])
        df = _gated(df, e["source"], F.split(F.col(e["source"]), pat), when)
    return df


def substitute_string(df: DataFrame, entries: list[dict], when: str | None = None) -> DataFrame:
    """entries: [{source, from (regex), to}]."""
    for e in entries:
        df = _gated(df, e["source"], F.regexp_replace(F.col(e["source"]), e["from"], e["to"]), when)
    return df
