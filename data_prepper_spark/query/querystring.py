"""Lucene query_string syntax -> query-DSL tree.

The reference's OpenSearch consumers issue `query_string` queries (the
classic Lucene QueryParser surface) alongside structured DSL; this module
compiles that syntax to the same dict tree `query.dsl` executes, so one
compiler (and one set of equivalence tests) covers both.

Supported syntax (the working subset of the public Lucene grammar):

  term                      analyzed match on the default field
  "a phrase"  "a phrase"~2  match_phrase (with slop)
  pre*  wild*card  wi?d     prefix / wildcard on the default field
  term~  term~1             fuzzy (default fuzziness 2, Lucene's AUTO cap)
  field:value               term filter on a docs attribute
  field:[a TO b]  {a TO b}  range filter (inclusive / exclusive bounds)
  field:>v  >=v  <v  <=v    one-sided range filter
  _exists_:field  field:*   exists filter
  clause^2                  boost
  +clause  -clause  NOT c   required / prohibited
  a AND b   a OR b   (...)  boolean operators with grouping

Operator precedence is NOT > AND > OR; bare adjacency binds at the level
of ``default_operator`` ("OR" by default, like OpenSearch). Within one
bool level, `+`/`-` modifiers override the group operator (Lucene's
modifier semantics: `-a b` = should(b) AND NOT a). A query that is pure
prohibition (`-a`) gets an implicit match_all base, mirroring OpenSearch.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["parse_query_string"]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b|&&) |
        (?P<or>OR\b|\|\|) |
        (?P<not>NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-(?=[^\s)])) |
        (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?) |
        (?P<range>(?:(?P<rfield>[A-Za-z_][\w.]*):)
            (?P<lb>[\[\{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*(?P<rb>[\]\}])) |
        (?P<cmp>(?P<cfield>[A-Za-z_][\w.]*):(?P<op>>=|<=|>|<)(?P<cval>[^\s()]+)) |
        (?P<term>(?:(?P<tfield>[A-Za-z_][\w.]*):)?
            (?P<tval>[^\s():^~"]+)(?:~(?P<fuzz>\d*))?(?:\^(?P<boost>\d+(?:\.\d+)?))?)
    )""",
    re.VERBOSE,
)


def _lex(q: str) -> list[dict]:
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if m is None or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"query_string syntax error at {q[pos:][:30]!r}")
        d = {k: v for k, v in m.groupdict().items() if v is not None}
        toks.append(d)
        pos = m.end()
    return toks


def _num(s: str) -> Any:
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


class _Parser:
    def __init__(self, toks: list[dict], default_field: str, default_op: str):
        self.toks = toks
        self.i = 0
        self.field = default_field
        self.default_op = default_op.upper()
        if self.default_op not in ("OR", "AND"):
            raise ValueError(f"default_operator must be OR/AND: {default_op!r}")

    def peek(self) -> dict | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> dict:
        t = self.toks[self.i]
        self.i += 1
        return t

    # items: (modifier, clause) with modifier in {"+", "-", None}
    def parse(self) -> dict:
        tree = self._or_expr()
        if self.peek() is not None:
            raise ValueError(f"unbalanced ')' in query_string at token {self.i}")
        return tree

    def _or_expr(self) -> dict:
        items = [self._and_expr()]
        while True:
            t = self.peek()
            if t is None or "rparen" in t:
                break
            if "or" in t:
                self.next()
                items.append(self._and_expr())
            elif self.default_op == "OR":
                items.append(self._and_expr())
            else:
                break
        return _combine(items, "OR") if len(items) > 1 else _lone(items[0], "OR")

    def _and_expr(self) -> dict | tuple:
        items = [self._mod_clause()]
        while True:
            t = self.peek()
            if t is None or "rparen" in t or "or" in t:
                break
            if "and" in t:
                self.next()
                items.append(self._mod_clause())
            elif self.default_op == "AND":
                items.append(self._mod_clause())
            else:
                break
        if len(items) == 1:
            return items[0]  # (mod, clause) bubbles up to the OR level
        return (None, _combine(items, "AND"))

    def _mod_clause(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ValueError("query_string ended where a clause was expected")
        mod = None
        if "plus" in t:
            self.next()
            mod = "+"
        elif "minus" in t or "not" in t:
            self.next()
            mod = "-"
        return (mod, self._primary())

    def _primary(self) -> dict:
        t = self.next()
        if "lparen" in t:
            inner = self._or_expr()
            end = self.peek()
            if end is None or "rparen" not in end:
                raise ValueError("missing ')' in query_string")
            self.next()
            return inner
        if "phrase" in t:
            spec: dict[str, Any] = {"query": t["ph"]}
            if "slop" in t:
                spec["slop"] = int(t["slop"])
            if "pboost" in t:
                spec["boost"] = float(t["pboost"])
            return {"match_phrase": {self.field: spec}}
        if "range" in t:
            bounds: dict[str, Any] = {}
            if t["lo"] != "*":
                bounds["gte" if t["lb"] == "[" else "gt"] = _num(t["lo"])
            if t["hi"] != "*":
                bounds["lte" if t["rb"] == "]" else "lt"] = _num(t["hi"])
            if not bounds:
                return {"exists": {"field": t["rfield"]}}
            return {"range": {t["rfield"]: bounds}}
        if "cmp" in t:
            op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[t["op"]]
            return {"range": {t["cfield"]: {op: _num(t["cval"])}}}
        if "term" in t:
            field = t.get("tfield", self.field)
            val = t["tval"]
            if field == "_exists_":
                return {"exists": {"field": val}}
            if field != self.field:
                # docs-attribute leaf: term filter (or exists via `field:*`)
                if val == "*":
                    return {"exists": {"field": field}}
                if "*" in val or "?" in val:
                    raise ValueError(
                        f"wildcards on non-indexed field {field!r} are unsupported"
                    )
                if "boost" in t or "fuzz" in t:
                    # attribute leaves compile to filter context (no score),
                    # so a boost/fuzziness there would be silently ignored —
                    # fail loudly like the wildcard case above
                    raise ValueError(
                        f"boost/fuzziness on non-indexed field {field!r} is "
                        "unsupported (attribute leaves are filters and carry "
                        "no score)"
                    )
                return {"term": {field: _num(val)}}
            boost = float(t["boost"]) if "boost" in t else None
            if "fuzz" in t:
                spec = {"value": val, "fuzziness": int(t["fuzz"] or 2)}
                if boost:
                    spec["boost"] = boost
                return {"fuzzy": {field: spec}}
            if "*" in val or "?" in val:
                body: dict[str, Any]
                if re.fullmatch(r"[^*?]+\*", val):
                    kind, body = "prefix", {"value": val[:-1]}
                else:
                    kind, body = "wildcard", {"value": val}
                if boost:
                    body["boost"] = boost
                return {kind: {field: body}}
            spec = {"query": val}
            if boost:
                spec["boost"] = boost
            return {"match": {field: spec}}
        raise ValueError(f"unexpected token in query_string: {t}")


def _lone(item: tuple, group_op: str) -> dict:
    mod, clause = item
    if mod == "-":
        return {"bool": {"must_not": [clause], "filter": [{"match_all": {}}]}}
    return clause


_FILTER_KINDS = ("term", "terms", "range", "match_all", "exists", "ids")


def _combine(items: list[tuple], group_op: str) -> dict:
    """Items of one bool level -> bool body. Modifiers override the group
    operator; unmodified items go to must (AND) or should (OR); filter
    leaves land in filter/must_not so they never contribute score."""
    must: list[dict] = []
    should: list[dict] = []
    must_not: list[dict] = []
    filters: list[dict] = []
    for mod, clause in items:
        kind = next(iter(clause))
        is_filter = kind in _FILTER_KINDS
        if mod == "-":
            must_not.append(clause)
        elif mod == "+" or group_op == "AND":
            (filters if is_filter else must).append(clause)
        else:
            # OR group: a filter-kind leaf stays a SHOULD clause (score 0)
            # so it widens the match set like Lucene's term query instead
            # of restricting it
            should.append(clause)
    body: dict[str, Any] = {}
    if must:
        body["must"] = must
    if should:
        body["should"] = should
    if must_not:
        body["must_not"] = must_not
    if filters:
        body["filter"] = filters
    if not (must or should or filters):
        body["filter"] = [{"match_all": {}}]  # pure prohibition
    return {"bool": body}


def parse_query_string(
    query: str,
    default_field: str = "content",
    default_operator: str = "OR",
) -> dict:
    """Parse a Lucene query_string into a query-DSL dict tree."""
    toks = _lex(query)
    if not toks:
        return {"match_all": {}}
    parser = _Parser(toks, default_field, default_operator)
    return parser.parse()
