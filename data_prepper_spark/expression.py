"""Data Prepper expression language -> Spark SQL (Column).

The reference parses statements like ``/status_code == 200 and /msg =~
"^GET"`` with ANTLR and interprets them per event (data-prepper-expression/
src/main/antlr/DataPrepperExpression.g4; stack-machine walk in
ParseTreeEvaluatorListener.java:31-105). We transpile the same grammar
surface to a Spark SQL expression string once per statement — Catalyst then
parses, optimizes, and codegens it, so the predicate runs vectorized.

Supported constructs (grammar refs in SURVEY §2.10):
  and / or / not                    g4:49-57,102-107
  == != < <= > >=                   g4:59-89
  =~  !~   (regex match)            g4:69-77      -> rlike
  in / not in  with {a, b} sets     g4:91-100     -> IN (...)
  + - * /  arithmetic, str concat   g4:19-47
  /json/pointer operands            g4:138-141    -> nested column refs
  length(/k), contains(a,b)         ExpressionFunction impls
  hasTags("t"), getMetadata("/k")   -> tags array / metadata columns
  cidrContains(/ip, "10.0.0.0/8")   -> bit-mask range test (IPv4)
"""

from __future__ import annotations

import ipaddress
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_POINTER = re.compile(r'(?<![\w")])/([A-Za-z0-9_][A-Za-z0-9_./-]*)')
_SET = re.compile(r"\{([^{}]*)\}")
_FUNC_LEN = re.compile(r"length\(\s*([^)]+?)\s*\)")
_FUNC_CONTAINS = re.compile(r"contains\(\s*([^,]+?)\s*,\s*([^)]+?)\s*\)")
_FUNC_HASTAGS = re.compile(r"hasTags\(\s*([^)]+?)\s*\)")
_FUNC_GETMETA = re.compile(r'getMetadata\(\s*"/?([^"]+)"\s*\)')
_FUNC_CIDR = re.compile(r"cidrContains\(\s*([^,]+?)\s*((?:,\s*\"[^\"]+\"\s*)+)\)")
_REGEX_OP = re.compile(r"(=~|!~)")


def _cidr_to_sql(ip_expr: str, cidrs: list[str]) -> str:
    """IPv4-in-CIDR as an integer range test (CidrExpressionFunction)."""
    ip_int = (
        f"(cast(split({ip_expr}, '\\\\.')[0] as bigint) * 16777216 + "
        f"cast(split({ip_expr}, '\\\\.')[1] as bigint) * 65536 + "
        f"cast(split({ip_expr}, '\\\\.')[2] as bigint) * 256 + "
        f"cast(split({ip_expr}, '\\\\.')[3] as bigint))"
    )
    tests = []
    for c in cidrs:
        net = ipaddress.ip_network(c.strip().strip('"'), strict=False)
        lo = int(net.network_address)
        hi = int(net.broadcast_address)
        tests.append(f"({ip_int} between {lo} and {hi})")
    return "(" + " or ".join(tests) + ")"


def translate(statement: str) -> str:
    """DP expression string -> Spark SQL expression string."""
    s = statement

    # functions first (their args may contain pointers)
    s = _FUNC_GETMETA.sub(lambda m: "`" + m.group(1).replace("/", "`.`") + "`", s)
    s = _FUNC_HASTAGS.sub(
        lambda m: "("
        + " and ".join(f"array_contains(tags, {t.strip()})" for t in m.group(1).split(","))
        + ")",
        s,
    )

    def cidr_sub(m: re.Match) -> str:
        ip = _pointer_sub(m.group(1).strip())
        cidrs = re.findall(r'"([^"]+)"', m.group(2))
        return _cidr_to_sql(ip, cidrs)

    s = _FUNC_CIDR.sub(cidr_sub, s)

    # set initializer {1, 2} -> (1, 2)
    s = _SET.sub(lambda m: "(" + m.group(1) + ")", s)

    # regex ops: a =~ "p" -> a rlike "p" ; a !~ "p" -> not (a rlike "p")
    def regex_rewrite(text: str) -> str:
        out = re.sub(r"(\S+)\s*=~\s*(\"[^\"]*\")", r"\1 rlike \2", text)
        out = re.sub(r"(\S+)\s*!~\s*(\"[^\"]*\")", r"not (\1 rlike \2)", out)
        return out

    s = regex_rewrite(s)
    s = _pointer_sub(s)
    # length() and contains() map 1:1 to Spark SQL builtins; leave in place.
    return s


def _pointer_sub(s: str) -> str:
    """JSON pointer /a/b -> backticked nested column ref `a`.`b`."""
    return _POINTER.sub(lambda m: "`" + m.group(1).replace("/", "`.`") + "`", s)


def evaluate(statement: str) -> Column:
    return F.expr(translate(statement))
