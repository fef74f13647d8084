"""Conditional routing (core:pipeline/router/RouteEventEvaluator.java:34-72).

The reference evaluates each route expression once per event and COPIES the
event to every matching sink (RouterCopyRecordStrategy). The Spark analog:
one filtered DataFrame per route off a shared parent — Catalyst reuses the
scan (and with ``.cache()`` on the parent, the computation) across branches.
An event matching two routes appears in both outputs, exactly like the
reference's copy semantics. ``_default`` collects events matching no route
(the reference's unrouted sink behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route(df: DataFrame, routes: dict[str, str], with_default: bool = True) -> dict[str, DataFrame]:
    out = {name: df.where(F.expr(expr)) for name, expr in routes.items()}
    if with_default:
        none_match = ~F.coalesce(
            F.greatest(*[F.expr(e).cast("boolean") for e in routes.values()])
            if len(routes) > 1
            else F.expr(next(iter(routes.values()))).cast("boolean"),
            F.lit(False),
        )
        out["_default"] = df.where(none_match)
    return out


def route_counts(df: DataFrame, routes: dict[str, str]) -> DataFrame:
    """Single-pass per-route match counts (copy semantics: one event can
    count toward several routes) — conditional aggregation, no multi-scan."""
    aggs = [
        F.sum(F.when(F.expr(e), 1).otherwise(0)).alias(name) for name, e in routes.items()
    ]
    return df.agg(*aggs)
