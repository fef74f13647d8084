"""Parse processors: grok, key_value, csv, parse_json, dissect, date.

Reference semantics (paths under /root/reference/data-prepper-plugins/):
- grok        grok-processor/.../GrokProcessor.java:59,120-136,232,264-295
- key_value   key-value-processor/.../KeyValueProcessor.java:38-59,232-238
- csv         csv-processor/.../CsvProcessor.java:35,53,113-115
- parse_json  parse-json-processor/.../ParseJsonProcessor.java:34,63-85
- dissect     dissect-processor/.../DissectProcessor.java:31-48,55
- date        date-processor/.../DateProcessor.java:31,61

All are expressed as Catalyst expressions (regexp_extract / str_to_map /
from_csv / from_json / to_timestamp) — JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- grok ----
# A from-scratch grok engine: %{PATTERN:field} expands recursively to a Java
# regex with named groups; one regexp_extract per capture (the plan shares
# the scan, and Spark's regex engine caches compiled patterns per task).
# Base patterns follow the public logstash pattern vocabulary used by the
# reference's pipelines (docs/latest_performance_test_results.md uses
# %{COMMONAPACHELOG}).

GROK_BASE = {
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\")",
    "IP": r"(?:[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3})",
    "IPORHOST": r"(?:[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}|[a-zA-Z0-9._-]+)",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "MONTH": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b",
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "TIME": r"(?:\d{2}:\d{2}:\d{2})",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "TIMESTAMP_ISO8601": r"%{YEAR}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|SEVERE|FATAL|ALERT|CRITICAL|[Dd]ebug|[Ii]nfo|[Ww]arn(?:ing)?|[Ee]rr(?:or)?|[Ff]atal)",
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] '
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    # -- extended vocabulary (public logstash grok-patterns family; all
    # inner groups are non-capturing so field numbering stays stable) --
    "BASE10NUM": r"(?<![0-9.+-])(?:[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "BASE16NUM": r"(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(?:\.?|\b)",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "QS": r"%{QUOTEDSTRING}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT:port})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "COMBINEDAPACHELOG": r'%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}',
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "DATESTAMP": r"(?:%{DATE_US}|%{DATE_EU})[- ]%{TIME}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}(?:[A-Fa-f0-9]{2})",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


def grok_expand(
    pattern: str,
    definitions: dict[str, str] | None = None,
    named_captures_only: bool = True,
) -> tuple[str, list[str]]:
    """Expand a grok pattern to (java_regex, captured_field_names).

    With ``named_captures_only=False``, a top-level bare ``%{IP}`` also
    captures under the pattern's own name (GrokProcessorConfig default is
    true, mirroring logstash)."""
    defs = {**GROK_BASE, **(definitions or {})}
    fields: list[str] = []

    def sub(m: re.Match, top: bool = False) -> str:
        name, field = m.group(1), m.group(2)
        if name not in defs:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        if not field and top and not named_captures_only:
            field = name
        if field:
            # reserve the outer group's index BEFORE expanding nested refs:
            # capture-group numbering follows opening-paren order
            fields.append(field)
            inner = _GROK_REF.sub(sub, defs[name])
            return f"({inner})"
        inner = _GROK_REF.sub(sub, defs[name])
        return f"(?:{inner})"

    regex = _GROK_REF.sub(lambda m: sub(m, top=True), pattern)
    return regex, fields


def grok(
    df: DataFrame,
    match: dict[str, list[str]],
    pattern_definitions: dict[str, str] | None = None,
    target_key: str | None = None,
    keep_empty_captures: bool = False,
    named_captures_only: bool = True,
    keys_to_overwrite: list[str] | None = None,
    tags_on_match_failure: list[str] | None = None,
    when: str | None = None,
) -> DataFrame:
    """Named-capture extraction (GrokProcessor). First matching pattern per
    source wins (break_on_match=true, the reference default).

    Captures merge into the row as new columns (or under ``target_key`` as a
    struct). A capture whose column already exists keeps the existing value
    unless listed in ``keys_to_overwrite`` (GrokProcessorConfig.java:14-43).
    Failed matches get ``tags_on_match_failure`` appended to a ``tags``
    array column, mirroring event-tagging semantics.
    """
    gate = F.expr(when) if when else F.lit(True)
    overwrite = set(keys_to_overwrite or [])
    sep = "\x1e"  # record separator; capture values must not contain it
    tmp_cols: list[str] = []
    for source, patterns in match.items():
        # break_on_match: coalesce over per-pattern extraction chains.
        # Single-pass extraction: ONE regexp_replace packs every capture
        # group into a sep-joined string ("$1<sep>$2..."), then a cheap
        # split feeds all fields — 2 regex executions per (row, pattern)
        # (rlike + packed replace) instead of 1 + n_captures. The packed
        # array is materialized as its own column so each field reference
        # is an attribute read, not a re-inlined regex tree.
        existing = set(df.columns) - set(tmp_cols)
        alts = [grok_expand(p, pattern_definitions, named_captures_only) for p in patterns]
        matched = F.lit(False)
        cols: dict[str, Column] = {}
        for pi, (rx, flds) in enumerate(alts):
            m = F.col(source).rlike(rx)
            if flds:
                rep = sep.join(f"${i + 1}" for i in range(len(flds)))
                packed = F.regexp_replace(
                    F.col(source), "(?s)^.*?(?:" + rx + ").*$", rep
                )
                arr_name = f"__grok_{source}_{pi}"
                tmp_cols.append(arr_name)
                df = df.withColumn(arr_name, F.split(packed, sep))
                arr = F.col(arr_name)
                # packed extraction would silently shift every field of a
                # row whose *captured values* contain the \x1e sentinel;
                # such rows (vanishingly rare in log data) fall back to
                # per-capture regexp_extract, which has no sentinel at all
                has_sep = F.col(source).contains(sep)
                for i, fld in enumerate(flds):
                    ext = F.when(
                        has_sep, F.regexp_extract(F.col(source), rx, i + 1)
                    ).otherwise(F.element_at(arr, i + 1))
                    prev = cols.get(fld)
                    cur = F.when(m & ~matched, ext)
                    cols[fld] = F.coalesce(prev, cur) if prev is not None else cur
            matched = matched | m
        if not keep_empty_captures:
            cols = {k: F.when(v != "", v) for k, v in cols.items()}
        if target_key:
            df = df.withColumn(
                target_key,
                F.when(gate, F.struct(*[v.alias(k) for k, v in cols.items()])),
            )
        else:
            for k, v in cols.items():
                if k in existing and k not in overwrite:
                    # existing event keys win unless listed in
                    # keys_to_overwrite (reference merge semantics)
                    continue
                df = df.withColumn(k, F.when(gate, v))
        if tags_on_match_failure:
            tags = F.col("tags") if "tags" in df.columns else F.array().cast("array<string>")
            df = df.withColumn(
                "tags",
                F.when(gate & ~matched, F.concat(tags, F.array(*[F.lit(t) for t in tags_on_match_failure]))).otherwise(tags),
            )
    return df.drop(*tmp_cols)


# ----------------------------------------------------------- key_value ----
def _chars_to_regex(chars: str) -> str:
    """Reference's buildRegexFromCharacters: each char becomes a regex
    alternative (KeyValueProcessor.java:188-202)."""
    return "|".join(re.escape(c) for c in chars)


def key_value(
    df: DataFrame,
    source: str,
    destination: str = "parsed_message",
    field_split_characters: str = "&",
    field_delimiter_regex: str | None = None,
    value_split_characters: str = "=",
    key_value_delimiter_regex: str | None = None,
    non_match_value: str | None = None,
    default_values: dict[str, str] | None = None,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    delete_key_regex: str | None = None,
    delete_value_regex: str | None = None,
    prefix: str | None = None,
    whitespace: str = "lenient",
    transform_key: str | None = None,
    remove_brackets: bool = False,
    when: str | None = None,
) -> DataFrame:
    """String field -> map<string,string> (KeyValueProcessor.java:38-59,
    232-238, executeConfigs at 415-472), as one Catalyst expression tree
    over the split-pairs array — split / transform / filter higher-order
    functions, no UDF.

    Option semantics follow the reference's non-recursive path:
    - ``field_delimiter_regex`` overrides ``field_split_characters`` (which
      compiles to a char-alternation regex, as in the reference)
    - groups without a key/value delimiter become (group, non_match_value)
    - include/exclude filter on the RAW key, before delete/prefix/transform
      (reference order), then delete_key_regex, prefix, delete_value_regex,
      whitespace='strict' (key stripTrailing / value stripLeading),
      transform_key (lowercase|uppercase|capitalize), remove_brackets
    - ``default_values`` fill keys absent after parsing
    - duplicate keys keep the FIRST occurrence (the reference collects
      duplicates into a list, which a map<string,string> cannot represent)
    - ``recursive`` bracket-tree parsing is not supported
    """
    if field_delimiter_regex and field_split_characters != "&":
        raise ValueError("field_delimiter_regex and field_split_characters cannot both be set")
    if key_value_delimiter_regex and value_split_characters != "=":
        raise ValueError("key_value_delimiter_regex and value_split_characters cannot both be set")
    field_rx = field_delimiter_regex or _chars_to_regex(field_split_characters)
    kv_rx = key_value_delimiter_regex or _chars_to_regex(value_split_characters)

    groups = F.filter(F.split(F.col(source), field_rx), lambda g: g != "")

    def entry(g):
        kv = F.split(g, kv_rx, 2)
        k = F.element_at(kv, 1)
        v = F.when(F.size(kv) >= 2, F.element_at(kv, 2)).otherwise(
            F.lit(non_match_value).cast("string")
        )
        return F.struct(k.alias("k"), v.alias("v"))

    entries = F.transform(groups, entry)
    raw_keys = F.transform(entries, lambda e: e["k"])
    # keep-first dedupe: entry survives iff its index is the first index of
    # its key (array_position is 1-based first match; n is tiny per row)
    entries = F.filter(entries, lambda e, i: F.array_position(raw_keys, e["k"]) == i + 1)
    if include_keys:
        inc = F.array(*[F.lit(x) for x in include_keys])
        entries = F.filter(entries, lambda e: F.array_contains(inc, e["k"]))
    if exclude_keys:
        exc = F.array(*[F.lit(x) for x in exclude_keys])
        entries = F.filter(entries, lambda e: ~F.array_contains(exc, e["k"]))

    def shape(e):
        k, v = e["k"], e["v"]
        if delete_key_regex:
            k = F.regexp_replace(k, delete_key_regex, "")
        if prefix:
            k = F.concat(F.lit(prefix), k)
        if delete_value_regex:
            v = F.when(v.isNotNull(), F.regexp_replace(v, delete_value_regex, ""))
        if whitespace == "strict":
            k = F.regexp_replace(k, r"\s+$", "")
            v = F.when(v.isNotNull(), F.regexp_replace(v, r"^\s+", ""))
        if transform_key == "lowercase":
            k = F.lower(k)
        elif transform_key == "uppercase":
            k = F.upper(k)
        elif transform_key == "capitalize":
            k = F.concat(F.upper(k.substr(F.lit(1), F.lit(1))), k.substr(F.lit(2), F.length(k)))
        if remove_brackets:
            v = F.when(v.isNotNull(), F.regexp_replace(v, r"[\[\]()<>]", ""))
        return F.struct(k.alias("k"), v.alias("v"))

    entries = F.transform(entries, shape)
    # second keep-first dedupe on the SHAPED keys: transform_key /
    # delete_key_regex / strict whitespace can map distinct raw keys onto
    # the same shaped key ("A" and "a" under lowercase), and
    # map_from_entries raises DUPLICATED_MAP_KEY under Spark's default
    # EXCEPTION policy. The reference tolerates duplicates
    # (KeyValueProcessor collects them); keep-first matches the raw-key
    # dedupe above.
    shaped_keys = F.transform(entries, lambda e: e["k"])
    entries = F.filter(entries, lambda e, i: F.array_position(shaped_keys, e["k"]) == i + 1)
    m = F.map_from_entries(entries)
    if default_values:
        defaults = F.map_from_arrays(
            F.array(*[F.lit(k) for k in default_values]),
            F.array(*[F.lit(v).cast("string") for v in default_values.values()]),
        )
        missing = F.map_filter(defaults, lambda k, _: ~F.array_contains(F.map_keys(m), k))
        m = F.map_concat(m, missing)
    out = F.when(F.expr(when), m) if when else m
    return df.withColumn(destination, out)


_BRACKETS = {"[": "]", "(": ")", "<": ">"}


def _kv_recurse(text: str, field_split: str, value_split: str, non_match_value) -> dict:
    """Python rendition of the reference's recursive bracket-tree parser
    (KeyValueProcessor.java:286-354 `recurse`): split into pairs at
    TOP-LEVEL field-delimiter characters (delimiters inside [], (), <>
    belong to the nested value), then per pair take the key before the
    first top-level kv delimiter; a fully-bracketed value recurses into a
    nested object, otherwise it is a scalar string."""
    stack: list[str] = []
    pairs: list[str] = []
    start = 0
    for i, ch in enumerate(text):
        if ch in _BRACKETS:
            stack.append(ch)
        elif stack and ch == _BRACKETS[stack[-1]]:
            stack.pop()
        elif not stack and ch == field_split:
            pairs.append(text[start:i])
            start = i + 1
    pairs.append(text[start:])
    out: dict = {}
    for pair in pairs:
        stack.clear()
        key = None
        for i, ch in enumerate(pair):
            if ch in _BRACKETS:
                stack.append(ch)
            elif stack and ch == _BRACKETS[stack[-1]]:
                stack.pop()
            elif not stack and ch == value_split:
                key = pair[:i].rstrip()
                vs = i + 1
                while vs < len(pair) and pair[vs] == " ":
                    vs += 1
                break
        if key is None or key == "":
            if pair:
                out[pair] = non_match_value
            continue
        value = pair[vs:]
        if value and value[0] in _BRACKETS and value[-1] == _BRACKETS[value[0]]:
            out[key] = _kv_recurse(
                value[1:-1].lstrip(), field_split, value_split, non_match_value
            )
        else:
            out[key] = value.lstrip()
    return out


def key_value_recursive(
    df: DataFrame,
    source: str,
    destination: str = "parsed_message",
    field_split_characters: str = "&",
    value_split_characters: str = "=",
    non_match_value: str | None = None,
    when: str | None = None,
) -> DataFrame:
    """Recursive bracket-tree key_value (the reference's ``recursive:
    true`` mode, KeyValueProcessor.java:240-247, 286-354): nested groups
    inside [], (), <> parse into nested objects. The nesting depth is
    data-dependent, so the result cannot be a static Spark map type — the
    destination column is the nested structure as a canonical JSON string
    (sorted keys OFF: insertion order preserved like the reference's
    ObjectNode), queryable downstream via ``get_json_object`` /
    ``from_json``.

    A recursive grammar is genuinely beyond Catalyst expressions; this is
    the documented Arrow-batched pandas-UDF case (one Python call per
    batch, not per row — the reference's own recursion, vectorized over
    the column). Like the reference, recursive mode restricts field/value
    delimiters to single non-bracket characters."""
    import json as _json

    # module-level pandas import: pyspark resolves the UDF's string type
    # hints ('pd.Series', stringified by `from __future__ import
    # annotations`) against the function's MODULE globals
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    globals().setdefault("pd", pd)
    if len(field_split_characters) != 1 or len(value_split_characters) != 1:
        raise ValueError(
            "recursive key_value is limited to single-character delimiters "
            "(KeyValueProcessor.java:91,126)"
        )
    if field_split_characters in "[]()<>" or value_split_characters in "[]()<>":
        raise ValueError("recursive key_value delimiters cannot be brackets")
    fs, vs, nmv = field_split_characters, value_split_characters, non_match_value

    @pandas_udf("string")
    def parse(col: pd.Series) -> pd.Series:
        return col.map(
            lambda s: None if s is None else _json.dumps(_kv_recurse(s, fs, vs, nmv))
        )

    out = parse(F.col(source))
    if when:
        out = F.when(F.expr(when), out)
    return df.withColumn(destination, out)


# ----------------------------------------------------------------- csv ----
def csv_parse(
    df: DataFrame,
    source: str,
    column_names: list[str] | None = None,
    delimiter: str = ",",
    quote_character: str = '"',
    column_names_source_key: str | None = None,
    when: str | None = None,
) -> DataFrame:
    """CSV string field -> named columns (CsvProcessor.java:35,53).

    ``column_names_source_key`` (CsvProcessor.java:113-115) reads the
    header from another field. The reference resolves it per event; a
    DataFrame has one static schema, so the header is taken from the first
    non-null value of that field (one tiny driver-side lookup) — the
    uniform-header case the reference's own tests exercise.
    """
    if column_names is None:
        assert column_names_source_key, "column_names or column_names_source_key required"
        first = (
            df.where(F.col(column_names_source_key).isNotNull())
            .select(column_names_source_key)
            .first()
        )
        assert first is not None, f"no non-null {column_names_source_key} row to read header from"
        column_names = [c.strip() for c in first[0].split(delimiter)]
    schema = ", ".join(f"`{c}` string" for c in column_names)
    parsed = F.from_csv(
        F.col(source), schema, {"sep": delimiter, "quote": quote_character}
    )
    gate = F.expr(when) if when else F.lit(True)
    for c in column_names:
        df = df.withColumn(c, F.when(gate, parsed[c]))
    return df


# ---------------------------------------------------------- parse_json ----
def parse_json(
    df: DataFrame,
    source: str = "message",
    schema: str | None = None,
    destination: str | None = None,
    pointer: str | None = None,
    when: str | None = None,
) -> DataFrame:
    """JSON string field -> columns (ParseJsonProcessor).

    With ``schema`` uses from_json (vectorized, pushdown-friendly); without,
    falls back to get_json_object per pointer. ``pointer`` subselects a
    JSON-pointer path like the reference (ParseJsonProcessor.java:63-85).
    """
    if pointer is not None:
        path = "$" + pointer.replace("/", ".")
        col = F.get_json_object(F.col(source), path)
        return df.withColumn(destination or pointer.strip("/").replace("/", "_"), col)
    assert schema is not None, "schema required when no pointer given"
    parsed = F.from_json(F.col(source), schema)
    if when:
        parsed = F.when(F.expr(when), parsed)
    if destination:
        return df.withColumn(destination, parsed)
    tmp = df.withColumn("__parsed", parsed)
    for fld in tmp.select("__parsed.*").columns:
        tmp = tmp.withColumn(fld, F.col("__parsed")[fld])
    return tmp.drop("__parsed")


# -------------------------------------------------------------- dissect ----
_DISSECT_FIELD = re.compile(r"%\{([^}]*)\}")


def dissect(df: DataFrame, source: str, pattern: str, when: str | None = None) -> DataFrame:
    """Logstash-style dissect: literal delimiters between %{field} refs.

    Supports skip fields (%{} / %{?name}) and append (%{+name}) with the
    default separator, mirroring DissectProcessor.java:31-48.
    """
    parts = _DISSECT_FIELD.split(pattern)
    # parts alternates: [lit0, f1, lit1, f2, lit2, ...]
    regex = re.escape(parts[0])
    fields: list[str] = []
    appends: dict[str, list[int]] = {}
    gi = 0
    for i in range(1, len(parts), 2):
        fld, lit = parts[i], re.escape(parts[i + 1])
        gi += 1
        if fld == "" or fld.startswith("?"):
            regex += r"(?:.*?)" if lit else r"(?:.*)"
            gi -= 1
        else:
            greedy = ".*" if i + 2 >= len(parts) and not lit else ".*?"
            regex += f"({greedy})"
            name = fld.lstrip("+")
            appends.setdefault(name, []).append(gi)
        regex += lit
    gate = F.expr(when) if when else F.lit(True)
    for name, groups in appends.items():
        cols = [F.regexp_extract(F.col(source), regex, g) for g in groups]
        val = cols[0] if len(cols) == 1 else F.concat_ws(" ", *cols)
        df = df.withColumn(name, F.when(gate, val))
    return df


# ----------------------------------------------------------------- date ----
def date_parse(
    df: DataFrame,
    match_key: str,
    patterns: list[str],
    destination: str = "@timestamp",
    source_timezone: str | None = None,
    when: str | None = None,
) -> DataFrame:
    """First-successful-format timestamp parse (DateProcessor):
    coalesce(try to_timestamp per format) — same "first format that parses
    wins" semantics, fully vectorized."""
    attempts = [F.try_to_timestamp(F.col(match_key), F.lit(p)) for p in patterns]
    col = F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]
    if source_timezone:
        col = F.to_utc_timestamp(col, source_timezone)
    if when:
        col = F.when(F.expr(when), col)
    return df.withColumn(destination, col)
