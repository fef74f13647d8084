"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
(implemented in data_prepper_spark/) over the driver's parquet tables; the
matching ``oracle_sql()`` is the ANSI-SQL equivalent DuckDB runs on the
same tables. Column names and types are aligned on both sides; floats are
rounded identically before comparison.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_prepper_spark.analyzer import duckdb_tokens_sql, tokens_col
from data_prepper_spark.operators import aggregate as agg_ops
from data_prepper_spark.operators import dedupe, multimodal, parse, route, similarity, textstats
from data_prepper_spark.query.adhoc import bm25_topk_adhoc

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the documents corpus at sf0.001."""
    docs = _t(spark, SF_SMOKE, "documents")
    return bm25_topk_adhoc(docs, "text", "doc_id", "key value table scan", k=10)


# --------------------------------------------------------------------------
# fulltext family (documents)
# --------------------------------------------------------------------------

FT_TERMS = ["key", "table", "scan", "merge", "row"]
FT_QUERY = "key value table scan"
FT_QUERY2 = "merge batch partition checkpoint"


def _ft_base(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks")
    )


def q_ft_doc_stats(spark, sf_dir):
    return _ft_base(spark, sf_dir).select("doc_id", F.size("toks").alias("doc_len"))


def q_ft_dictionary(spark, sf_dir):
    return (
        _ft_base(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"), F.count(F.lit(1)).alias("cf"))
    )


def q_ft_corpus_stats(spark, sf_dir):
    return _ft_base(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size("toks")), 6).alias("avgdl"),
        F.sum(F.size("toks")).alias("total_tokens"),
    )


def q_ft_postings(spark, sf_dir):
    return (
        _ft_base(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(FT_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def q_ft_bm25_topk(spark, sf_dir):
    return bm25_topk_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, 10)


def q_ft_bm25_topk2(spark, sf_dir):
    return bm25_topk_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY2, 20)


def q_ft_bm25_filtered(spark, sf_dir):
    """Filtered search: top-k among docs matching an attribute predicate,
    with corpus-wide statistics (Lucene filter-query semantics)."""
    return bm25_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, 10,
        doc_filter="lang = 'en'",
    )


def _ft_oracles() -> dict[str, str]:
    toks = duckdb_tokens_sql("text")
    base = f"select doc_id, {toks} as toks from documents"
    terms_in = ", ".join(f"'{t}'" for t in FT_TERMS)

    def bm25_sql(query_terms: list[str], k: int, doc_where: str | None = None) -> str:
        tl = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
        filter_join = (
            f"join (select doc_id from documents where {doc_where}) f using(doc_id)"
            if doc_where
            else ""
        )
        return f"""
with tk as ({base}),
dl as (select doc_id, len(toks) as dl from tk),
posts as (
  select doc_id, term, count(*) as tf
  from (select doc_id, unnest(toks) as term from tk)
  where term in ({tl}) group by doc_id, term),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
tdf as (select term, count(*) as df from posts group by term),
scored as (
  select p.doc_id,
         round(sum(ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))), 4) as score
  from posts p join tdf t using(term) join dl d using(doc_id) cross join stats s
  group by p.doc_id)
select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
       doc_id, score
from scored {filter_join} order by score desc, doc_id asc limit {k}
"""

    from data_prepper_spark.analyzer import tokenize_py

    return {
        "ft_doc_stats": f"select doc_id, cast(len(toks) as int) as doc_len from ({base})",
        "ft_dictionary": f"""
            select term, count(distinct doc_id) as df, count(*) as cf
            from (select doc_id, unnest(toks) as term from ({base})) group by term""",
        "ft_corpus_stats": f"""
            select cast(count(*) as bigint) as n_docs, round(avg(len(toks)), 6) as avgdl,
                   cast(sum(len(toks)) as bigint) as total_tokens from ({base})""",
        "ft_postings": f"""
            select term, doc_id, count(*) as tf
            from (select doc_id, unnest(toks) as term from ({base}))
            where term in ({terms_in}) group by term, doc_id""",
        "ft_bm25_topk": bm25_sql(tokenize_py(FT_QUERY), 10),
        "ft_bm25_topk2": bm25_sql(tokenize_py(FT_QUERY2), 20),
        "ft_bm25_filtered": bm25_sql(tokenize_py(FT_QUERY), 10, doc_where="lang = 'en'"),
        "ft_delete_soft": bm25_sql(
            tokenize_py(FT_QUERY), 1000000, doc_where="doc_id not in (1, 2, 3)"
        ),
        "ft_multi_match": f"""
            select rank, doc_id, round(score * 3, 4) as score
            from ({bm25_sql(tokenize_py(FT_QUERY), 10)}) order by rank""",
        "ft_ids_filtered": bm25_sql(
            tokenize_py(FT_QUERY), 10,
            doc_where="doc_id in ("
            + ",".join(str(i) for i in range(0, 400, 7))
            + ") and lang is not null",
        ),
        "dsl_search_after": """
with f as (
  select doc_id, cast(2.5 as double) as score, lang, n_chars
  from documents where n_chars >= 200),
aft as (
  select * from f where (lang > 'en') or (lang = 'en' and doc_id > 150))
select cast(row_number() over (order by lang asc, doc_id asc) as int) as rank,
       doc_id, score, lang, n_chars
from aft order by lang asc, doc_id asc limit 12
""",
        "dsl_search_highlight": f"""
with tk as ({base}),
dl as (select doc_id, len(toks) as dl from tk),
posts as (
  select doc_id, term, count(*) as tf
  from (select doc_id, unnest(toks) as term from tk)
  where term in ('key', 'scan', 'table') group by doc_id, term),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
tdf as (select term, count(*) as df from posts group by term),
per as (
  select p.doc_id, p.term,
         ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)) as sc
  from posts p join tdf t using(term) join dl d using(doc_id) cross join stats s),
agg as (
  select doc_id, round(sum(sc), 4) as score,
         count(distinct case when term in ('key', 'table') then term end) as n_must
  from per group by doc_id),
sel as (
  select a.doc_id, a.score
  from agg a join documents d using(doc_id)
  where a.n_must = 2 and (d.lang is null or d.lang <> 'fr')),
ranked as (
  select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
         doc_id, score
  from sel order by score desc, doc_id asc limit 10),
snip as (
  select doc_id,
         array_to_string(toks[greatest(hits[1] - 2, 1) :
                              greatest(hits[1] - 2, 1) + 9], ' ') as snippet
  from (select doc_id, toks,
          list_transform(
            list_filter(range(len(toks)),
                        i -> toks[i+1] in ('key', 'scan', 'table')),
            i -> i + 1) as hits
        from tk)
  where len(hits) > 0)
select r.rank, r.doc_id, r.score, s2.snippet
from ranked r left join snip s2 using(doc_id) order by r.rank
""",
        "dsl_query_string": f"""
with tk as ({base}),
dl as (select doc_id, len(toks) as dl from tk),
posts as (
  select doc_id, term, count(*) as tf
  from (select doc_id, unnest(toks) as term from tk)
  where term in ('key', 'scan', 'table') group by doc_id, term),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
tdf as (select term, count(*) as df from posts group by term),
per as (
  select p.doc_id, p.term,
         ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)) as sc
  from posts p join tdf t using(term) join dl d using(doc_id) cross join stats s),
agg as (
  select doc_id, round(sum(sc), 4) as score,
         count(distinct case when term in ('key', 'table') then term end) as n_must
  from per group by doc_id),
sel as (
  select a.doc_id, a.score
  from agg a join documents d using(doc_id)
  where a.n_must = 2 and (d.lang is null or d.lang <> 'fr'))
select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
       doc_id, score
from sel order by score desc, doc_id asc limit 10
""",
        "agg_terms_substats": f"""
            with tk as (select doc_id, lang, n_chars, {toks} as toks from documents),
            m as (select lang, n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0)
            select lang, cast(count(*) as bigint) as doc_count,
                   cast(count(n_chars) as bigint) as chars_count,
                   min(n_chars) as chars_min, max(n_chars) as chars_max,
                   avg(n_chars) as chars_avg,
                   cast(sum(n_chars) as bigint) as chars_sum
            from m group by lang
            order by doc_count desc, lang asc limit 10""",
        "agg_top_hits": f"""
            with tk as (select doc_id, lang, n_chars, {toks} as toks from documents),
            m as (select doc_id, lang, n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0),
            b as (select lang, cast(count(*) as bigint) as doc_count
                  from m group by lang order by doc_count desc, lang asc limit 5),
            h as (select lang, doc_id, n_chars,
                         cast(row_number() over (partition by lang
                              order by n_chars desc, doc_id asc) as int) as hit_rank
                  from m)
            select b.lang, b.doc_count, h.doc_id, h.n_chars, h.hit_rank
            from b join h using(lang) where h.hit_rank <= 2""",
        "agg_percentiles_chars": f"""
            with tk as (select doc_id, n_chars, {toks} as toks from documents),
            m as (select cast(n_chars as double) as v from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0),
            q as (select quantile_cont(v, [0.05, 0.25, 0.5, 0.75, 0.95]) as vs from m)
            select cast(p.percent as double) as percent, round(q.vs[p.i], 4) as value
            from q cross join (values (1, 5.0), (2, 25.0), (3, 50.0),
                                      (4, 75.0), (5, 95.0)) p(i, percent)
            order by p.percent""",
        "agg_range_chars": f"""
            with tk as (select doc_id, n_chars, {toks} as toks from documents),
            m as (select n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0)
            select r.key, r."from", r."to",
                   (select count(*) from m
                    where (r."from" is null or m.n_chars >= r."from")
                      and (r."to" is null or m.n_chars < r."to")) as doc_count
            from (values ('*-500.0', cast(null as double), 500.0),
                         ('500.0-2000.0', 500.0, 2000.0),
                         ('2000.0-*', 2000.0, cast(null as double))) r(key, "from", "to")""",
        "agg_histogram_chars": f"""
            with tk as (select doc_id, n_chars, {toks} as toks from documents),
            m as (select n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0)
            select floor(n_chars / 300.0) * 300.0 as key,
                   count(*) as doc_count
            from m group by 1 order by 1""",
        "dsl_dis_max": f"""
with tk as ({base}),
dl as (select doc_id, len(toks) as dl from tk),
posts as (
  select doc_id, term, count(*) as tf
  from (select doc_id, unnest(toks) as term from tk)
  where term in ('key', 'scan', 'table', 'value') group by doc_id, term),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
tdf as (select term, count(*) as df from posts group by term),
per as (
  select p.doc_id, p.term,
         ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)) as sc
  from posts p join tdf t using(term) join dl d using(doc_id) cross join stats s),
ca as (select doc_id, sum(sc) as s from per where term in ('key', 'value') group by doc_id),
cb as (select doc_id, sum(sc) as s from per where term in ('table', 'scan') group by doc_id),
u as (select coalesce(ca.doc_id, cb.doc_id) as doc_id,
             greatest(coalesce(ca.s, -1e308), coalesce(cb.s, -1e308)) as mx,
             coalesce(ca.s, 0) + coalesce(cb.s, 0) as sm
      from ca full outer join cb on ca.doc_id = cb.doc_id),
scored as (select doc_id, round(mx + 0.3 * (sm - mx), 4) as score from u)
select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
       doc_id, score
from scored order by score desc, doc_id asc limit 10
""",
        "dsl_boosting": f"""
with tk as ({base}),
dl as (select doc_id, len(toks) as dl from tk),
posts as (
  select doc_id, term, count(*) as tf
  from (select doc_id, unnest(toks) as term from tk)
  where term in ('key', 'table') group by doc_id, term),
stats as (select count(*) as n, avg(dl) as avgdl from dl),
tdf as (select term, count(*) as df from posts group by term),
agg as (
  select p.doc_id, sum(ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) as s
  from posts p join tdf t using(term) join dl d using(doc_id) cross join stats s
  group by p.doc_id),
scored as (
  select a.doc_id,
         round(a.s * case when d.lang = 'fr' then 0.4 else 1.0 end, 4) as score
  from agg a join documents d using(doc_id))
select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
       doc_id, score
from scored order by score desc, doc_id asc limit 10
""",
        "agg_filters_buckets": f"""
            with tk as (select doc_id, lang, n_chars, {toks} as toks from documents),
            m as (select lang, n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0),
            b(key) as (values ('short'), ('fr'), ('tagged')),
            agg as (
              select 'short' as key, cast(count(*) as bigint) as doc_count,
                     round(avg(n_chars), 4) as chars from m where n_chars < 800
              union all
              select 'fr', cast(count(*) as bigint), round(avg(n_chars), 4)
              from m where lang = 'fr'
              union all
              select 'tagged', cast(count(*) as bigint), round(avg(n_chars), 4)
              from m where lang is not null)
            select b.key, coalesce(a.doc_count, 0) as doc_count, a.chars
            from b left join agg a using(key) order by b.key""",
        "agg_extended_stats": f"""
            with tk as (select doc_id, n_chars, {toks} as toks from documents),
            m as (select n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0)
            select cast(count(n_chars) as bigint) as "count",
                   min(n_chars) as "min", max(n_chars) as "max",
                   round(avg(n_chars), 4) as "avg",
                   cast(sum(n_chars) as bigint) as "sum",
                   round(sum(cast(n_chars as double) * n_chars), 2) as sum_of_squares,
                   round(var_pop(n_chars), 2) as variance,
                   round(stddev_pop(n_chars), 4) as std_deviation
            from m""",
    }


# --------------------------------------------------------------------------
# TPC-H-style relational queries (aggregate / join / filter pushdown)
# --------------------------------------------------------------------------


def q_q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where("l_shipdate <= timestamp '2001-09-02'")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_q3_top_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where("c_mktsegment = 'BUILDING'")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_q6_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        "l_shipdate >= timestamp '2000-01-01' and l_shipdate < timestamp '2001-01-01' "
        "and l_discount between 0.05 and 0.07 and l_quantity < 24"
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


def q_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): the multi-join plan a 100 TB
    deployment cares about — region/nation are hint-broadcast (fixed-size
    dims, no shuffle), supplier is left to AQE's size threshold (it
    scales with SF), the fact-fact lineitem-orders join shuffles on the
    order key, the date filter pushes to the orders parquet scan, and
    c_nationkey = s_nationkey joins customers to LOCAL suppliers before
    the broadcast nation lookup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        "o_orderdate >= timestamp '1996-01-01' and o_orderdate < timestamp '1998-01-01'"
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where("r_name = 'ASIA'")
    nat = F.broadcast(
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            # no broadcast hint: supplier scales with SF (10k rows x SF),
            # so at a 100x scale-up a forced broadcast ships a too-large
            # side to every executor. AQE's size threshold decides instead
            # (it still broadcasts at bench SF); nation/region stay hinted
            # as genuinely fixed-size dims.
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(nat, s["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


def _tpch_oracles() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
                   round(avg(l_quantity), 4) as avg_qty,
                   round(avg(l_discount), 4) as avg_disc,
                   count(*) as count_order
            from lineitem where l_shipdate <= timestamp '2001-09-02'
            group by l_returnflag, l_linestatus""",
        "q3_top_revenue": """
            select o_orderkey, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING'
            group by o_orderkey, o_orderpriority
            order by revenue desc, o_orderkey asc limit 10""",
        "q6_revenue": """
            select round(sum(l_extendedprice * l_discount), 2) as revenue
            from lineitem
            where l_shipdate >= timestamp '2000-01-01' and l_shipdate < timestamp '2001-01-01'
              and l_discount between 0.05 and 0.07 and l_quantity < 24""",
        "q5_local_supplier": """
            select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from customer join orders on c_custkey = o_custkey
            join lineitem on l_orderkey = o_orderkey
            join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
            join nation on s_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            where r_name = 'ASIA'
              and o_orderdate >= timestamp '1996-01-01'
              and o_orderdate < timestamp '1998-01-01'
            group by n_name order by revenue desc""",
    }


# --------------------------------------------------------------------------
# events: parse / window-agg / dedupe / route / mutate (Data Prepper ops)
# --------------------------------------------------------------------------

ROUTES = {
    "errors": "event_type = 'error'",
    "high_value": "value >= 400",
    "clicks_or_views": "event_type in ('click', 'view')",
}


def q_events_parse_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ev = parse.parse_json(ev, source="props", schema="k int", destination="parsed")
    return ev.select("event_id", "event_type", F.col("parsed.k").alias("k")).where("k > 80")


def q_events_windowed_count(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.date_trunc("hour", "ts"))
    return agg_ops.count(ev, ["event_type", "hour"], count_key="value_count")


def q_events_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return agg_ops.histogram(ev, ["event_type"], "value", [0.0, 500.0] + [25.0 * i for i in range(1, 20)]).select(
        "event_type",
        "bucket",
        "bucket_count",
        F.round("min", 4).alias("min_value"),
        F.round("max", 4).alias("max_value"),
        F.round("sum", 4).alias("sum_value"),
    )


def q_events_remove_duplicates(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first = agg_ops.remove_duplicates(
        ev.withColumn("__ord", F.struct("ts", "event_id")), ["user_id", "event_type"], "__ord"
    )
    return first.select("event_id", "user_id", "event_type", "ts", F.round("value", 4).alias("value"))


def q_events_route_counts(spark, sf_dir):
    return route.route_counts(_t(spark, sf_dir, "events"), ROUTES)


def q_events_mutate_chain(spark, sf_dir):
    from data_prepper_spark.operators import mutate

    ev = _t(spark, sf_dir, "events")
    ev = mutate.add_entries(ev, [{"key": "label", "format": "${event_type}:${user_id}"}])
    ev = mutate.uppercase_string(ev, ["event_type"])
    ev = mutate.substitute_string(ev, [{"source": "props", "from": r"[{}\"]", "to": ""}])
    ev = ev.withColumn("value_floor", F.floor("value").cast("long"))
    return ev.select("event_id", "label", "event_type", "props", "value_floor")


def q_translate_tiers(spark, sf_dir):
    from data_prepper_spark.operators.translate import translate_map, translate_ranges

    ev = _t(spark, sf_dir, "events")
    ev = translate_ranges(ev, "value", "tier", [(0, 10, "low"), (10, 50, "mid")], default="high")
    ev = translate_map(
        ev,
        "event_type",
        "category",
        {"click": "ui", "view": "ui", "error": "ops", "purchase": "commerce"},
        default="other",
    )
    return ev.groupBy("tier", "category").agg(F.count(F.lit(1)).alias("n"))


def _events_oracles() -> dict[str, str]:
    bucket_case = (
        "cast(case when value < 0 then 0 when value >= 500 then 21 "
        "else floor(value / 25) + 1 end as bigint)"
    )
    return {
        "events_parse_json": """
            select event_id, event_type,
                   cast(regexp_extract(props, '"k": ([0-9]+)', 1) as int) as k
            from events where cast(regexp_extract(props, '"k": ([0-9]+)', 1) as int) > 80""",
        "events_windowed_count": """
            select event_type, date_trunc('hour', ts) as hour, count(*) as value_count
            from events group by event_type, date_trunc('hour', ts)""",
        "events_histogram": f"""
            select event_type, {bucket_case} as bucket, count(*) as bucket_count,
                   round(min(value), 4) as min_value, round(max(value), 4) as max_value,
                   round(sum(value), 4) as sum_value
            from events group by event_type, {bucket_case}""",
        "events_remove_duplicates": """
            select event_id, user_id, event_type, ts, round(value, 4) as value
            from events
            qualify row_number() over (partition by user_id, event_type
                                       order by ts asc, event_id asc) = 1""",
        "events_route_counts": """
            select cast(sum(case when event_type = 'error' then 1 else 0 end) as bigint) as errors,
                   cast(sum(case when value >= 400 then 1 else 0 end) as bigint) as high_value,
                   cast(sum(case when event_type in ('click','view') then 1 else 0 end) as bigint) as clicks_or_views
            from events""",
        "events_mutate_chain": """
            select event_id, event_type || ':' || cast(user_id as varchar) as label,
                   upper(event_type) as event_type,
                   regexp_replace(props, '[{}"]', '', 'g') as props,
                   cast(floor(value) as bigint) as value_floor
            from events""",
        "translate_tiers": """
            select case when value >= 0 and value < 10 then 'low'
                        when value >= 10 and value < 50 then 'mid'
                        else 'high' end as tier,
                   case event_type when 'click' then 'ui' when 'view' then 'ui'
                        when 'error' then 'ops' when 'purchase' then 'commerce'
                        else 'other' end as category,
                   count(*) as n
            from events group by 1, 2""",
    }


# --------------------------------------------------------------------------
# parse round-trips: grok / key_value / dissect / date
# --------------------------------------------------------------------------


def _event_logline(ev: DataFrame) -> DataFrame:
    from data_prepper_spark.util import spread

    ev = spread(ev)
    ip = F.format_string(
        "10.%d.%d.%d",
        F.col("user_id") % 200,
        F.col("event_id") % 256,
        (F.col("user_id") * 7) % 254 + 1,
    )
    line = F.format_string(
        '%s - user%d [01/Jan/2024:00:00:00 +0000] "GET /api/%s HTTP/1.0" %d %d',
        ip,
        F.col("user_id"),
        F.col("event_type"),
        F.col("event_id") % 300 + 200,
        F.col("event_id") % 50000,
    )
    return ev.withColumn("line", line)


def q_grok_roundtrip(spark, sf_dir):
    ev = _event_logline(_t(spark, sf_dir, "events"))
    ev = parse.grok(ev, match={"line": ["%{COMMONAPACHELOG}"]})
    return ev.select(
        "event_id",
        "clientip",
        "auth",
        "request",
        F.col("response").cast("int").alias("response"),
        F.col("bytes").cast("long").alias("bytes"),
    )


def q_kv_roundtrip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "kv", F.format_string("type=%s&uid=%d", F.col("event_type"), F.col("user_id"))
    )
    ev = parse.key_value(ev, source="kv", destination="m")
    return ev.select(
        "event_id",
        F.col("m")["type"].alias("type_val"),
        F.col("m")["uid"].cast("long").alias("uid_val"),
    )


def q_kv_advanced(spark, sf_dir):
    """key_value with regex delimiters, strict whitespace, key transform,
    non_match_value and default_values (KeyValueProcessor.java:38-59)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "kv",
        F.format_string("Type :%s; uid :%d; orphan", F.col("event_type"), F.col("user_id")),
    )
    ev = parse.key_value(
        ev,
        source="kv",
        destination="m",
        field_delimiter_regex=r";\s*",
        key_value_delimiter_regex=":",
        non_match_value="missing",
        default_values={"env": "prod"},
        whitespace="strict",
        transform_key="lowercase",
    )
    return ev.select(
        "event_id",
        F.col("m")["type"].alias("type_val"),
        F.col("m")["uid"].cast("long").alias("uid_val"),
        F.col("m")["orphan"].alias("orphan_val"),
        F.col("m")["env"].alias("env_val"),
    )


def q_grok_syslog(spark, sf_dir):
    """Syslog pattern family (SYSLOGBASE pulls timestamp/logsource/program/
    pid through nested pattern refs)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "line",
        F.format_string(
            "Jan 12 03:04:05 host%d app-%d[%d]: %s event",
            F.col("user_id") % 50,
            F.col("user_id") % 9,
            F.col("event_id") % 100 + 1,
            F.col("event_type"),
        ),
    )
    ev = parse.grok(ev, match={"line": [r"%{SYSLOGBASE} %{GREEDYDATA:msg}"]})
    return ev.select(
        "event_id",
        "timestamp",
        "logsource",
        "program",
        F.col("pid").cast("int").alias("pid"),
        "msg",
    )


def q_dissect_roundtrip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "s",
        F.format_string(
            "%s|%s|%d", F.col("event_type"), F.date_format("ts", "yyyy-MM-dd"), F.col("user_id")
        ),
    )
    ev = parse.dissect(ev, source="s", pattern="%{etype}|%{day}|%{uid}")
    return ev.select("event_id", "etype", "day", F.col("uid").cast("long").alias("uid"))


def q_date_roundtrip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_str", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    ev = parse.date_parse(ev, "ts_str", ["yyyy-MM-dd HH:mm:ss"], destination="parsed_ts")
    return ev.select("event_id", "parsed_ts")


def _roundtrip_oracles() -> dict[str, str]:
    return {
        "grok_roundtrip": """
            select event_id,
                   printf('10.%d.%d.%d', user_id % 200, event_id % 256, (user_id * 7) % 254 + 1) as clientip,
                   'user' || cast(user_id as varchar) as auth,
                   '/api/' || event_type as request,
                   cast(event_id % 300 + 200 as int) as response,
                   event_id % 50000 as bytes
            from events""",
        "kv_roundtrip": """
            select event_id, event_type as type_val, user_id as uid_val from events""",
        "kv_advanced": """
            select event_id, event_type as type_val, user_id as uid_val,
                   'missing' as orphan_val, 'prod' as env_val
            from events""",
        "grok_syslog": """
            select event_id, 'Jan 12 03:04:05' as timestamp,
                   'host' || cast(user_id % 50 as varchar) as logsource,
                   'app-' || cast(user_id % 9 as varchar) as program,
                   cast(event_id % 100 + 1 as int) as pid,
                   event_type || ' event' as msg
            from events""",
        "dissect_roundtrip": """
            select event_id, event_type as etype, strftime(ts, '%Y-%m-%d') as day, user_id as uid
            from events""",
        "date_roundtrip": """
            select event_id, date_trunc('second', ts) as parsed_ts from events""",
    }


# --------------------------------------------------------------------------
# dedup / similarity / text analysis (training-data pipeline ops)
# --------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return dedupe.exact_dedupe(_t(spark, sf_dir, "documents"), "text", "doc_id").withColumnRenamed(
        "doc_id", "keep_id"
    )


JACCARD_DF_CUTOFF = 100  # shingles in >100 docs are dropped (prefix filtering)


def q_dedup_jaccard_pairs(spark, sf_dir):
    pairs = dedupe.jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.5, shingle_n=1,
        max_shingle_df=JACCARD_DF_CUTOFF,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedupe.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_perm=16, bands=4, shingle_n=2
    )


def q_minhash_verified_pairs(spark, sf_dir):
    """LSH candidates + exact-Jaccard verification: with 16 bands of 2 rows
    the miss probability at s=0.8 is (1-0.8^2)^16 ~ 8e-8, so the verified
    output equals the exact-Jaccard answer the DuckDB oracle computes."""
    pairs = dedupe.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_perm=32, bands=16, shingle_n=2, verify_threshold=0.8,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: exact-Jaccard pairs -> connected components ->
    (doc_id, component) keep-set labels. The oracle recomputes components
    with a recursive transitive-closure CTE."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedupe.jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, shingle_n=1,
        max_shingle_df=JACCARD_DF_CUTOFF,
    )
    comp = dedupe.connected_components(pairs, docs.select("doc_id"))
    return comp.select(F.col("id").alias("doc_id"), "component")


def q_simhash(spark, sf_dir):
    """Oracle-recomputable signature: md5-derived 60-bit token hash (DuckDB
    recomputes the identical simhash in SQL)."""
    return dedupe.simhash64(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        bits=60, token_hash=dedupe.md5_hash60,
    )


def q_simhash_pairs(spark, sf_dir):
    """Pigeonhole-blocked Hamming matches; the oracle cross-joins the
    recomputed signatures, so this also proves the blocking is exact."""
    return dedupe.simhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        max_hamming=3, bits=60, token_hash=dedupe.md5_hash60,
    )


PHRASE = "table scan"


def q_phrase_search(spark, sf_dir):
    """Exact-phrase match counts over the documents corpus (Lucene
    match_phrase analog; query/phrase.py ad-hoc path, pure Catalyst)."""
    from data_prepper_spark.query.phrase import phrase_match_adhoc

    out = phrase_match_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", PHRASE)
    return out.withColumnRenamed("id", "doc_id")


def q_prefix_topk(spark, sf_dir):
    """Lucene PrefixQuery analog (scoring-boolean rewrite): BM25 bool-OR
    over every corpus term starting with 'sc', expansion capped at the
    lowest-df terms (query/multiterm.py; indexed twin parity-tested)."""
    from data_prepper_spark.query.multiterm import prefix_topk_adhoc

    return prefix_topk_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", "sc", k=10)


def q_fuzzy_topk(spark, sf_dir):
    """Lucene FuzzyQuery analog: terms within 1 Levenshtein edit of the
    typo 'tabl' (sharing its first letter), scored as a bool-OR."""
    from data_prepper_spark.query.multiterm import fuzzy_topk_adhoc

    return fuzzy_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "tabl", max_edits=1, k=10
    )


def q_wildcard_topk(spark, sf_dir):
    """Lucene WildcardQuery analog: '*'/'?' pattern over dictionary terms
    ('s?a*' matches scan/...), scored as a bool-OR (query/multiterm.py)."""
    from data_prepper_spark.query.multiterm import wildcard_topk_adhoc

    return wildcard_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "s?a*", k=10
    )


def q_facet_counts(spark, sf_dir):
    """OpenSearch terms-aggregation analog: language facet counts over
    all docs matching >= 1 query term."""
    from data_prepper_spark.query.multiterm import facet_counts_adhoc

    return facet_counts_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, "lang"
    )


def q_phrase_prefix_topk(spark, sf_dir):
    """match_phrase_prefix (Lucene MultiPhraseQuery, search-as-you-type):
    'key tab' — the phrase 'key' followed by any dictionary expansion of
    'tab' (query/phrase.py phrase_prefix_topk; one union position array
    for all expansions, so pf sums per-expansion phrase freqs)."""
    from data_prepper_spark.query.phrase import phrase_prefix_topk_adhoc

    return phrase_prefix_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "key tab",
        k=10, round_to=4,
    )


def q_significant_terms(spark, sf_dir):
    """OpenSearch significant_terms aggregation (JLH heuristic): content
    terms over-represented in the query's match set vs the corpus
    background (query/multiterm.py significant_terms; background from the
    index dictionary on the indexed path — no second corpus scan)."""
    from data_prepper_spark.query.multiterm import significant_terms_adhoc

    return significant_terms_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        size=10, round_to=6,
    )


def q_more_like_this(spark, sf_dir):
    """Lucene MoreLikeThisQuery analog: the source doc's top tf*idf terms
    (minDocFreq-filtered, capped) become a bool-OR BM25 query excluding
    the source doc (query/multiterm.py; indexed twin parity-tested)."""
    from data_prepper_spark.query.multiterm import more_like_this_adhoc

    return more_like_this_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", doc_id=0,
        k=10, max_query_terms=10,
    )


def q_highlight(spark, sf_dir):
    """Token-window highlighter (OpenSearch highlight-from-_source
    analog): window of analyzed tokens around the first query-term hit,
    plus total hit count."""
    from data_prepper_spark.query.multiterm import highlight_adhoc

    return highlight_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, window=10, lead=2
    )


def q_phrase_sloppy(spark, sf_dir):
    """Ordered sloppy phrase matching (Lucene match_phrase slop analog,
    ordered subset): per-doc occurrence counts of the phrase with up to 2
    intervening tokens allowed between terms (query/phrase.py greedy
    minimal-chain filter, pure Catalyst)."""
    from data_prepper_spark.query.phrase import phrase_match_adhoc

    out = phrase_match_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", PHRASE, slop=2
    )
    return out.withColumnRenamed("id", "doc_id")


def q_phrase_sloppy_topk(spark, sf_dir):
    """Sloppy-SCORED phrase top-k (Lucene SloppyPhraseScorer weighting:
    each match contributes 1/(1+excess gaps); query/phrase.py
    phrase_topk_adhoc(slop=2); the indexed twin
    phrase_topk(proximity=True, slop=2) is parity-tested in pytest)."""
    from data_prepper_spark.query.phrase import phrase_topk_adhoc

    return phrase_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", PHRASE, k=10, slop=2
    )


def q_phrase_prox_topk(spark, sf_dir):
    """Proximity-SCORED phrase top-k (Lucene PhraseQuery scoring): the
    phrase is a pseudo-term with freq = exact-occurrence count and idf =
    sum of per-position term idfs, so occurrence count and doc length
    drive the ranking (query/phrase.py phrase_topk_adhoc; the indexed
    twin phrase_topk(proximity=True) is parity-tested in pytest)."""
    from data_prepper_spark.query.phrase import phrase_topk_adhoc

    return phrase_topk_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", PHRASE, k=10)


def q_text_quality(spark, sf_dir):
    return textstats.text_quality(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_t(spark, sf_dir, "documents"), "text", "doc_id")


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_t(spark, sf_dir, "documents"), "text", "doc_id").select(
        "id", "fingerprint_md5"
    )


def q_training_data_pipeline(spark, sf_dir):
    """Composed training-data curation pipeline over documents: exact
    dedup (keep smallest id per digest) -> quality filter (drop shorts &
    high-punct) -> language ID -> fingerprint. One declarative plan; the
    oracle recomputes the whole chain in SQL."""
    docs = _t(spark, sf_dir, "documents")
    keep = dedupe.exact_dedupe(docs, "text", "doc_id").select(
        F.col("doc_id").alias("keep_id")
    )
    kept = docs.join(keep, docs.doc_id == keep.keep_id).drop("keep_id")
    quality = textstats.text_quality(kept, "text", "doc_id")
    good_ids = quality.where(
        (~F.col("is_short")) & (F.col("punct_ratio") < 0.3)
    ).select("id")
    lang = textstats.lang_id(kept, "text", "doc_id").join(good_ids, "id")
    fp = textstats.fingerprint(kept, "text", "doc_id").select("id", "fingerprint_md5")
    return lang.join(fp, "id").select(
        F.col("id").alias("doc_id"), "pred_lang", "marker_hits", "fingerprint_md5"
    )


def q_multimodal_meta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.extract_metadata(multimodal.attach_binary(docs, "text", "doc_id"))


def q_ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.where("vec_id = 0").select("embedding").collect()[0][0]
    top = similarity.brute_force_topk(emb, "embedding", "vec_id", list(qvec), k=10)
    return top.select(F.col("id").alias("vec_id"), F.round("sim", 4).alias("sim"))


def q_ft_delete_soft(spark, sf_dir):
    """Soft delete through the live index (index/build.delete_docs):
    builds a real index over the documents table, tombstones three docs,
    and runs block-max WAND — deleted docs vanish while every survivor
    keeps its full-corpus BM25 score (Lucene delete-then-merge: stats
    change only at refresh purge). Oracle = full-corpus BM25 minus the
    victims, so this row proves the live-docs filter AND the
    stats-unchanged semantic in one shot. Original doc ids ride the
    index's repo attribute so the oracle can address them."""
    import os as _os
    import shutil
    import tempfile

    from data_prepper_spark.index.build import build_index, delete_docs
    from data_prepper_spark.query.wand import bm25_topk_wand

    base = _os.path.join(tempfile.gettempdir(), "dps_delete_idx")
    src, idx = _os.path.join(base, "src"), _os.path.join(base, "idx")
    shutil.rmtree(base, ignore_errors=True)
    _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("repo"),
        F.lit("p").alias("path"), F.lit("c").alias("commit"),
        "lang", F.col("text").alias("content"),
    ).repartition(2).write.parquet(src)
    build_index(spark, src, idx, n_shards=8, units=1, shard_groups=1)
    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "repo")
    victims = [
        r.doc_id for r in docs.where(F.col("repo").isin("1", "2", "3")).collect()
    ]
    delete_docs(spark, idx, victims)
    from pyspark.sql.window import Window

    out = bm25_topk_wand(spark, idx, FT_QUERY, k=1000000)
    mapped = out.join(docs, "doc_id").select(
        F.col("repo").cast("long").alias("doc_id"),
        F.round("score", 4).alias("score"),
    )
    w = F.row_number().over(
        Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return mapped.select(w.cast("int").alias("rank"), "doc_id", "score")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN (operators/similarity.ivf_*): spherical k-means
    centroids from a deterministic sample, one Arrow-batched matmul
    assignment pass, probe the nprobe nearest centroids only (partition
    pruned when persisted partitionBy(centroid)). Rows-only by design:
    centroids are float-iteration artifacts, not SQL-recomputable; the
    nprobe=all identity (== brute force) and clustered-recall bounds are
    pytest-asserted in tests/test_dedupe_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_train(emb, "embedding", "vec_id", dim=64, n_centroids=8)
    assigned = similarity.ivf_assign(emb, "embedding", "vec_id", cents)
    qvec = list(emb.where("vec_id = 0").select("embedding").collect()[0][0])
    return similarity.ivf_topk(assigned, qvec, cents, k=10, nprobe=3).select(
        F.col("id").alias("vec_id"), F.round("sim", 4).alias("sim")
    )


def q_embed_dup_clusters(spark, sf_dir):
    """Embedding near-dup clustering: connected components over the
    cosine-threshold pair graph (similarity.embedding_dup_clusters —
    pair generation composed with the shared min-label propagation;
    exact pair method here for the oracle, LSH is the scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_dup_clusters(
        emb, "embedding", "vec_id", dim=64, threshold=0.45, method="exact"
    )


def q_embed_top_pairs(spark, sf_dir):
    """Embedding near-dup pairs (the all-pairs verification path of
    operators/similarity.embedding_pairs): global top-20 most-similar
    pairs ranked on the rounded cosine with id tiebreaks. The scale path
    is method='lsh' (bucket-join candidates + exact-cosine verify, never
    all-pairs) — recall-asserted in tests/test_dedupe_ann.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_pairs(
        emb, "embedding", "vec_id", dim=64, top_n=20, method="exact"
    )


def q_ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qvec = list(emb.where("vec_id = 0").select("embedding").collect()[0][0])
    bucketed = similarity.lsh_bucketed(
        emb, "embedding", "vec_id", dim=64, n_planes=6, n_tables=2
    )
    return similarity.lsh_topk(
        bucketed, qvec, dim=64, k=10, n_planes=6, probe_hamming=1, n_tables=2
    )


def _duckdb_bigrams(toks: str) -> str:
    """DuckDB bigram shingle strings matching shingles(n=2): concat of 2
    consecutive tokens, one shingle even for 0/1-token docs (coalesce '')."""
    return (
        f"list_distinct(list_transform(range(greatest(len({toks}) - 1, 1)), "
        f"i -> coalesce({toks}[i+1], '') || coalesce({toks}[i+2], '')))"
    )


def _jaccard2_oracle(toks: str, threshold: float) -> str:
    """Exact bigram-Jaccard pairs >= threshold (oracle for the verified
    minhash path — LSH miss probability at the threshold is ~1e-7)."""
    return f"""
with tk as (select doc_id, {toks} as toks from documents),
sh as (select doc_id as id, unnest({_duckdb_bigrams('toks')}) as sh from tk),
sizes as (select id, count(*) as sz from sh group by id),
common as (
  select l.id as id_a, r.id as id_b, count(*) as c
  from sh l join sh r on l.sh = r.sh and l.id < r.id
  group by l.id, r.id)
select id_a, id_b, round(c / (sa.sz + sb.sz - c), 4) as jaccard
from common join sizes sa on sa.id = id_a join sizes sb on sb.id = id_b
where c / (sa.sz + sb.sz - c) >= {threshold}"""


def _simhash60_sig_sql(toks: str) -> str:
    """Recompute the md5-60-bit simhash signature per doc in DuckDB."""
    h = "('0x' || substr(md5(tok), 1, 15))::BIGINT"
    bit_sums = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then w else -w end) as b{b}" for b in range(60)
    )
    sig_expr = " + ".join(
        f"(case when b{b} > 0 then (1::BIGINT << {b}) else 0::BIGINT end)" for b in range(60)
    )
    return f"""
tk as (select doc_id as id, unnest({toks}) as tok from documents),
w as (select id, tok, count(*) as w, {h} as h from tk group by id, tok),
bs as (select id, {bit_sums} from w group by id),
sig as (select id, cast({sig_expr} as bigint) as simhash from bs)"""


def _phrase_sloppy_oracle(toks: str, phrase: str, slop: int) -> str:
    """DuckDB twin of the ordered-sloppy greedy minimal-chain matcher:
    q_j = min position of term_j strictly after q_{j-1}; an anchor matches
    iff the chain's width <= (n-1) + slop."""
    from data_prepper_spark.analyzer import tokenize_py

    terms = tokenize_py(phrase)
    uniq = sorted(set(terms))
    idx = {t: i for i, t in enumerate(uniq)}
    pos_cols = ", ".join(
        f"list_filter(range(len(toks)), i -> toks[i+1] = '{t}') as pos_{i}"
        for i, t in enumerate(uniq)
    )
    chain = "a"
    for t in terms[1:]:
        chain = f"list_min(list_filter(pos_{idx[t]}, x -> x > {chain}))"
    return f"""
        with tk as (select doc_id, {toks} as toks from documents),
        p as (select doc_id, {pos_cols} from tk),
        m as (select doc_id,
                cast(len(list_filter(pos_{idx[terms[0]]},
                     a -> coalesce({chain} - a <= {len(terms) - 1 + slop}, false))) as int)
                  as n_matches
              from p)
        select doc_id, n_matches from m where n_matches > 0"""


def _phrase_sloppy_topk_oracle(toks: str, phrase: str, slop: int, k: int = 10) -> str:
    """DuckDB twin of phrase_topk_adhoc(slop>0): Lucene sloppy weighting —
    per anchor, greedy minimal chain width; each in-budget match weighs
    1/(1 + excess gaps); pf = sum of weights feeds the pseudo-term BM25."""
    from data_prepper_spark.analyzer import tokenize_py

    terms = tokenize_py(phrase)
    uniq = sorted(set(terms))
    idx = {t: i for i, t in enumerate(uniq)}
    exact_w = len(terms) - 1
    pos_cols = ", ".join(
        f"list_filter(range(len(toks)), i -> toks[i+1] = '{t}') as pos_{i}"
        for i, t in enumerate(uniq)
    )
    chain = "a"
    for t in terms[1:]:
        chain = f"list_min(list_filter(pos_{idx[t]}, x -> x > {chain}))"
    df_cols = ", ".join(
        f"count(*) filter (where len(pos_{i}) > 0) as df_{i}"
        for i in range(len(uniq))
    )
    sum_idf = " + ".join(
        f"ln(1 + (n - df_{idx[t]} + 0.5) / (df_{idx[t]} + 0.5))" for t in terms
    )
    return f"""
        with tk as (select doc_id, {toks} as toks from documents),
        p as (select doc_id, len(toks) as dl, {pos_cols} from tk),
        stats as (select count(*) as n, avg(dl) as avgdl, {df_cols} from p),
        w as (select doc_id, dl,
                list_filter(list_transform(pos_{idx[terms[0]]}, a -> {chain} - a),
                            v -> coalesce(v <= {exact_w + slop}, false)) as widths
              from p),
        m as (select doc_id, dl,
                cast(len(widths) as int) as n_matches,
                list_sum(list_transform(widths, v -> 1.0 / (1 + v - {exact_w}))) as pf
              from w where len(widths) > 0),
        sc as (select doc_id, n_matches,
                round(({sum_idf}) * (pf * 2.2)
                      / (pf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 4) as score
               from m, stats)
        select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
               doc_id, score, n_matches
        from sc order by score desc, doc_id asc limit {k}"""


def _phrase_prox_oracle(toks: str, phrase: str, k: int = 10) -> str:
    """DuckDB twin of query/phrase.py phrase_topk_adhoc (Lucene
    PhraseQuery scoring: pf-frequency BM25 with summed per-position
    idfs)."""
    from data_prepper_spark.analyzer import tokenize_py

    terms = tokenize_py(phrase)
    uniq = sorted(set(terms))
    idx = {t: i for i, t in enumerate(uniq)}
    df_cols = ", ".join(
        f"count(*) filter (where len(list_filter(toks, x -> x = '{t}')) > 0) as df_{i}"
        for i, t in enumerate(uniq)
    )
    adj = " and ".join(f"toks[i+{j + 1}] = '{t}'" for j, t in enumerate(terms))
    sum_idf = " + ".join(
        f"ln(1 + (n - df_{idx[t]} + 0.5) / (df_{idx[t]} + 0.5))" for t in terms
    )
    return f"""
        with base as (select doc_id, {toks} as toks from documents),
        b2 as (select doc_id, len(toks) as dl, toks from base),
        stats as (select count(*) as n, avg(dl) as avgdl, {df_cols} from b2),
        m as (select doc_id, dl,
                cast(len(list_filter(range(len(toks) - {len(terms) - 1}),
                     i -> {adj})) as int) as n_matches
              from b2),
        sc as (select doc_id, n_matches,
                round(({sum_idf}) * (n_matches * 2.2)
                      / (n_matches + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 4) as score
               from m, stats where n_matches > 0)
        select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
               doc_id, score, n_matches
        from sc order by score desc, doc_id asc limit {k}"""


def _multiterm_oracle(toks: str, term_where: str, max_expansions: int, k: int = 10) -> str:
    """DuckDB twin of the multi-term bool-OR BM25 (prefix/fuzzy rewrite +
    lowest-df expansion cap + sum of per-term contributions)."""
    return f"""
        with base as (select doc_id, len({toks}) as dl, {toks} as toks from documents),
        stats as (select count(*) as n, avg(dl) as avgdl from base),
        posts as (select doc_id, dl, term, count(*) as tf
                  from (select doc_id, dl, unnest(toks) as term from base)
                  where {term_where} group by doc_id, dl, term),
        tdf as (select term, cast(count(*) as bigint) as df from posts group by term
                order by df asc, term asc limit {max_expansions}),
        sc as (select doc_id,
                 round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) as score
               from posts join tdf using(term), stats group by doc_id)
        select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
               doc_id, score
        from sc order by score desc, doc_id asc limit {k}"""


def _textops_oracles() -> dict[str, str]:
    toks = duckdb_tokens_sql("text")
    stop_in = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    langs = sorted(textstats.LANG_MARKERS.items())
    cnt_cols = ", ".join(
        "len(list_filter(toks, x -> x in ({}))) as c_{}".format(
            ", ".join(f"'{w}'" for w in words), lang
        )
        for lang, words in langs
    )
    mx = "greatest({})".format(", ".join(f"c_{l}" for l, _ in langs))
    pred_chain = " ".join(f"when c_{l} = mx then '{l}'" for l, _ in langs)
    return {
        "dedup_exact": """
            select min(doc_id) as keep_id, count(*) as dup_count
            from documents group by md5(text)""",
        "dedup_jaccard_pairs": f"""
            with sh0 as (select distinct doc_id as id, term as sh
                         from (select doc_id, unnest({toks}) as term from documents)),
            dfreq as (select sh, count(*) as df from sh0 group by sh),
            sh as (select id, s.sh from sh0 s join dfreq using(sh)
                   where df <= {JACCARD_DF_CUTOFF}),
            sizes as (select id, count(*) as sz from sh group by id),
            common as (
              select l.id as id_a, r.id as id_b, count(*) as c
              from sh l join sh r on l.sh = r.sh and l.id < r.id
              group by l.id, r.id)
            select id_a, id_b, round(c / (sa.sz + sb.sz - c), 4) as jaccard
            from common join sizes sa on sa.id = id_a join sizes sb on sb.id = id_b
            where c / (sa.sz + sb.sz - c) >= 0.5""",
        "minhash_verified_pairs": _jaccard2_oracle(toks, 0.8),
        "dedup_clusters": f"""
            with recursive sh0 as (select distinct doc_id as id, term as sh
                         from (select doc_id, unnest({toks}) as term from documents)),
            dfreq as (select sh, count(*) as df from sh0 group by sh),
            sh as (select id, s.sh from sh0 s join dfreq using(sh)
                   where df <= {JACCARD_DF_CUTOFF}),
            sizes as (select id, count(*) as sz from sh group by id),
            common as (
              select l.id as id_a, r.id as id_b, count(*) as c
              from sh l join sh r on l.sh = r.sh and l.id < r.id
              group by l.id, r.id),
            pairs as (
              select id_a, id_b
              from common join sizes sa on sa.id = id_a join sizes sb on sb.id = id_b
              where c / (sa.sz + sb.sz - c) >= 0.5),
            edges as (select id_a as src, id_b as dst from pairs
                      union select id_b, id_a from pairs),
            reach(id, r) as (
              select doc_id, doc_id from documents
              union
              select r.id, e.dst from reach r join edges e on e.src = r.r),
            comp as (select id, min(r) as component from reach group by id)
            select d.doc_id, c.component
            from documents d join comp c on c.id = d.doc_id""",
        "simhash": f"""
            with {_simhash60_sig_sql(toks)}
            select id, simhash from sig""",
        "simhash_pairs": f"""
            with {_simhash60_sig_sql(toks)}
            select a.id as id_a, b.id as id_b,
                   cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
            from sig a join sig b on a.id < b.id
            where bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "phrase_prox_topk": _phrase_prox_oracle(toks, PHRASE),
        "phrase_sloppy": _phrase_sloppy_oracle(toks, PHRASE, 2),
        "ft_prefix_topk": _multiterm_oracle(toks, "term like 'sc%'", 128),
        "ft_wildcard_topk": _multiterm_oracle(
            toks, "regexp_matches(term, '^s.a.*$')", 128
        ),
        "ft_more_like_this": f"""
            with base as (select doc_id, {toks} as toks from documents),
            stats as (select count(*) as n from base),
            src as (select term, cast(count(*) as bigint) as tf
                    from (select unnest(toks) as term from base where doc_id = 0)
                    group by term),
            dfs as (select term, cast(count(*) as bigint) as df
                    from (select distinct doc_id, unnest(toks) as term from base)
                    where term in (select term from src) group by term),
            qt as (select s.term
                   from src s join dfs using(term), stats
                   where df >= 2
                   order by -round(tf * ln(1 + (n - df + 0.5) / (df + 0.5)), 6), s.term
                   limit 10),
            b2 as (select doc_id, len(toks) as dl, toks from base),
            st2 as (select count(*) as n, avg(dl) as avgdl from b2),
            posts as (select doc_id, dl, term, count(*) as tf
                      from (select doc_id, dl, unnest(toks) as term from b2)
                      where term in (select term from qt) group by doc_id, dl, term),
            tdf as (select term, cast(count(*) as bigint) as df from posts group by term),
            sc as (select doc_id,
                     round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                           * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) as score
                   from posts join tdf using(term), st2 group by doc_id)
            select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
                   doc_id, score
            from sc where doc_id != 0 order by score desc, doc_id asc limit 10""",
        "ft_highlight": f"""
            with t as (select doc_id, {toks} as toks from documents),
            m as (select doc_id, toks,
                    list_transform(
                      list_filter(range(len(toks)),
                                  i -> toks[i+1] in ('key', 'scan', 'table', 'value')),
                      i -> i + 1) as hits
                  from t)
            select doc_id, cast(len(hits) as int) as n_hits,
                   array_to_string(toks[greatest(hits[1] - 2, 1) :
                                        greatest(hits[1] - 2, 1) + 9], ' ') as snippet
            from m where len(hits) > 0""",
        "ft_fuzzy_topk": _multiterm_oracle(
            toks, "term like 't%' and levenshtein(term, 'tabl') <= 1", 64
        ),
        "ft_facets": f"""
            with t as (select doc_id, lang, {toks} as toks from documents)
            select lang, cast(count(*) as bigint) as doc_count
            from t
            where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0
            group by lang""",
        "ft_phrase_prefix_topk": f"""
            with tk as (select doc_id, {toks} as toks from documents),
            st as (select count(*) as n, avg(len(toks)) as avgdl from tk),
            dfs as (select
                (select count(*) from tk where list_contains(toks, 'key')) as df_key,
                (select least(sum(df), (select n from st)) from (
                    select term, count(*) as df from (
                      select doc_id, unnest(list_distinct(toks)) as term from tk)
                    where term like 'tab%' group by term)) as df_pre),
            m as (select doc_id, len(toks) as dl,
                    len(list_filter(range(len(toks) - 1),
                        i -> toks[i+1] = 'key' and toks[i+2] like 'tab%')) as pf
                  from tk),
            sc as (select m.doc_id, m.pf,
                     round((ln(1 + (st.n - dfs.df_key + 0.5) / (dfs.df_key + 0.5))
                          + ln(1 + (st.n - dfs.df_pre + 0.5) / (dfs.df_pre + 0.5)))
                          * (m.pf * 2.2)
                          / (m.pf + 1.2 * (1 - 0.75 + 0.75 * m.dl / st.avgdl)),
                          4) as score
                   from m cross join st cross join dfs where m.pf > 0)
            select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
                   doc_id, score, cast(pf as int) as n_matches
            from sc order by score desc, doc_id asc limit 10""",
        "ft_significant_terms": f"""
            with t as (select doc_id, list_distinct({toks}) as toks from documents),
            stats as (select count(*) as n_docs from t),
            m as (select doc_id, toks from t
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0),
            fgt as (select count(*) as fg_total from m),
            fg as (select term, count(*) as fg_count
                   from (select doc_id, unnest(toks) as term from m) group by term),
            bg as (select term, count(*) as bg_count
                   from (select doc_id, unnest(toks) as term from t) group by term)
            select term, cast(fg_count as bigint) as fg_count,
                   cast(bg_count as bigint) as bg_count,
                   round((fg_count * 1.0 / fg_total - bg_count * 1.0 / n_docs)
                         * (fg_count * 1.0 / fg_total) / (bg_count * 1.0 / n_docs),
                         6) as score
            from fg join bg using(term) cross join fgt cross join stats
            where fg_count >= 3
              and fg_count * 1.0 / fg_total > bg_count * 1.0 / n_docs
            order by score desc, term asc limit 10""",
        "phrase_sloppy_topk": _phrase_sloppy_topk_oracle(toks, PHRASE, 2),
        "phrase_search": f"""
            with tk as (select doc_id, {toks} as toks from documents),
            m as (select doc_id,
                         cast(len(list_filter(range(len(toks) - 1),
                              i -> toks[i+1] = 'table' and toks[i+2] = 'scan')) as int) as n_matches
                  from tk)
            select doc_id, n_matches from m where n_matches > 0""",
        "text_quality": f"""
            with t as (select doc_id, text, {toks} as toks from documents)
            select doc_id as id,
                   cast(len(toks) as int) as n_tokens,
                   cast(length(text) as int) as n_chars_raw,
                   cast(len(regexp_extract_all(text, '\\S+')) as int) as n_ws_tokens,
                   cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) as int) as n_subwords,
                   round(case when len(toks) > 0
                         then len(list_filter(toks, x -> x in ({stop_in}))) / len(toks)
                         else 0.0 end, 6) as stopword_ratio,
                   round(case when length(text) > 0
                         then length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text)
                         else 0.0 end, 6) as punct_ratio,
                   round(case when len(toks) > 0
                         then length(array_to_string(toks, '')) / len(toks)
                         else 0.0 end, 6) as avg_token_len,
                   len(toks) < 10 as is_short
            from t""",
        "lang_id": f"""
            with t as (select doc_id, {toks} as toks from documents),
            c as (select doc_id, {cnt_cols} from t),
            m as (select doc_id, {mx} as mx, * from c)
            select doc_id as id,
                   case when mx = 0 then 'unknown' {pred_chain} end as pred_lang,
                   cast(mx as int) as marker_hits
            from m""",
        "fingerprint_md5": f"""
            select doc_id as id, md5(array_to_string({toks}, ' ')) as fingerprint_md5
            from documents""",
        "training_data_pipeline": f"""
            with tk as (select doc_id, text, {toks} as toks from documents),
            keep as (select min(doc_id) as doc_id from documents group by md5(text)),
            kept as (select t.* from tk t join keep using(doc_id)),
            q as (select doc_id,
                    len(toks) < 10 as is_short,
                    case when length(text) > 0
                         then length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text)
                         else 0.0 end as punct_ratio
                  from kept),
            good as (select doc_id from q where not is_short and punct_ratio < 0.3),
            c as (select doc_id, {cnt_cols} from kept),
            m as (select doc_id, {mx} as mx, * from c),
            lang as (select doc_id,
                            case when mx = 0 then 'unknown' {pred_chain} end as pred_lang,
                            cast(mx as int) as marker_hits from m),
            fp as (select doc_id, md5(array_to_string(toks, ' ')) as fingerprint_md5 from kept)
            select l.doc_id, pred_lang, marker_hits, fingerprint_md5
            from lang l join good using(doc_id) join fp using(doc_id)""",
        "multimodal_meta": """
            select doc_id as id, cast(octet_length(encode(text)) as bigint) as n_bytes,
                   md5(text) as md5, 'image' as modality
            from documents""",
        "ann_cosine_topk": """
            with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0)
            select vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) as sim
            from embeddings cross join q
            order by list_cosine_similarity(embedding::DOUBLE[], qv) desc, vec_id asc
            limit 10""",
        "embed_dup_clusters": """
            with recursive pairs as (
              select a.vec_id as id_a, b.vec_id as id_b
              from embeddings a join embeddings b on a.vec_id < b.vec_id
              where round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]), 4) >= 0.45),
            edges as (select id_a as src, id_b as dst from pairs
                      union select id_b, id_a from pairs),
            reach(id, r) as (
              select vec_id, vec_id from embeddings
              union
              select r.id, e.dst from reach r join edges e on e.src = r.r)
            select id, min(r) as component from reach group by id""",
        "embed_top_pairs": """
            select id_a, id_b, cosine from (
              select a.vec_id as id_a, b.vec_id as id_b,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]), 4) as cosine
              from embeddings a join embeddings b on a.vec_id < b.vec_id)
            order by cosine desc, id_a asc, id_b asc limit 20""",
    }


# --------------------------------------------------------------------------
# aggregate actions / traces / enrichment / anomaly (SURVEY §2.4, §2.9)
# --------------------------------------------------------------------------


def _ordered_events(spark, sf_dir):
    return _t(spark, sf_dir, "events").withColumn("__ord", F.struct("ts", "event_id"))


def q_agg_put_all(spark, sf_dir):
    ev = _ordered_events(spark, sf_dir).select("user_id", "event_type", "event_id", "ts", "__ord")
    out = agg_ops.put_all(ev, ["user_id"], "__ord")
    return out.select("user_id", "event_type", "event_id", "ts")


def q_agg_append(spark, sf_dir):
    # values scaled to integer 1e-4 units, and the collected array serialized
    # to a csv string: the driver's canonicalizer can't hash array cells
    ev = _t(spark, sf_dir, "events").withColumn(
        "rv", F.round(F.col("value") * 10000, 0).cast("long")
    )
    out = agg_ops.append(ev, ["user_id", "event_type"], ["rv"])
    return out.select(
        "user_id",
        "event_type",
        F.concat_ws(",", F.col("rv").cast("array<string>")).alias("rv"),
    )


def q_agg_percent_sampler(spark, sf_dir):
    ev = _ordered_events(spark, sf_dir)
    out = agg_ops.percent_sampler(ev, ["event_type"], 25.0, "__ord")
    return out.select("event_id", "event_type")


def q_agg_tail_sampler(spark, sf_dir):
    ev = _ordered_events(spark, sf_dir)
    out = agg_ops.tail_sampler(ev, ["user_id"], "event_type = 'error'", 0, "__ord")
    return out.select("event_id", "user_id", "event_type")


def q_agg_rate_limiter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = agg_ops.rate_limiter(ev, ["event_type"], 1, "ts", tiebreakers=["event_id"])
    return out.select("event_id", "event_type", "ts")


def _spans(spark, sf_dir):
    """Deterministic span table derived from events: traceId = user_id,
    spanId = 'user-event', parent = same-trace span at floor(event_id/7)*7
    (roots where event_id % 3 == 0), serviceName = event_type."""
    ev = _t(spark, sf_dir, "events")
    sid = F.format_string("%d-%d", F.col("user_id"), F.col("event_id"))
    pid = F.when(
        F.col("event_id") % 3 != 0,
        F.format_string("%d-%d", F.col("user_id"), (F.floor(F.col("event_id") / 7) * 7).cast("long")),
    )
    return ev.select(
        F.col("user_id").cast("string").alias("traceId"),
        sid.alias("spanId"),
        pid.alias("parentSpanId"),
        F.col("event_type").alias("serviceName"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias("traceGroup"),
        F.col("event_id"),
    )


def q_service_map_edges(spark, sf_dir):
    from data_prepper_spark.operators.trace import service_map_edges

    return service_map_edges(_spans(spark, sf_dir))


def q_trace_group_fill(spark, sf_dir):
    from data_prepper_spark.operators.trace import fill_trace_group

    spans = _spans(spark, sf_dir)
    # one root per trace: keep the smallest root event_id as THE root
    roots = spans.where("parentSpanId is null").groupBy("traceId").agg(
        F.min("event_id").alias("event_id")
    )
    one_root = spans.join(roots, ["traceId", "event_id"])
    spans_one = spans.where("parentSpanId is not null").unionByName(one_root)
    out = fill_trace_group(spans_one)
    return out.select("spanId", "traceGroup")


GEO_RANGES = [
    # (net_lo, net_hi, country): /16s inside 10.0/8, mirrors a prefix table
    (10 * 16777216, 10 * 16777216 + 3 * 65536 - 1, "US"),
    (10 * 16777216 + 3 * 65536, 10 * 16777216 + 7 * 65536 - 1, "DE"),
    (10 * 16777216 + 100 * 65536, 10 * 16777216 + 140 * 65536 - 1, "JP"),
]


def q_geo_enrich(spark, sf_dir):
    """Broadcast /16-bucketed range lookup (geoip analog) — BroadcastHashJoin,
    not NestedLoop (operators/enrich.py geo_enrich)."""
    from data_prepper_spark.operators.enrich import geo_enrich

    ev = _t(spark, sf_dir, "events").withColumn(
        "ip",
        F.format_string(
            "10.%d.%d.%d",
            F.col("user_id") % 200,
            F.col("event_id") % 256,
            (F.col("user_id") * 7) % 254 + 1,
        ),
    )
    geo = spark.createDataFrame(GEO_RANGES, "net_lo long, net_hi long, country string")
    out = geo_enrich(ev, "ip", geo)
    return out.select("event_id", "ip", "country")


def q_split_string(spark, sf_dir):
    from data_prepper_spark.operators import mutate

    ev = _t(spark, sf_dir, "events").withColumn(
        "csv", F.format_string("%s|%d|%d", F.col("event_type"), F.col("user_id"), F.col("event_id"))
    )
    out = mutate.split_string(ev, [{"source": "csv", "delimiter": "|"}])
    return out.select(
        "event_id", F.concat_ws("~", F.col("csv")).alias("parts"), F.size("csv").alias("n_parts")
    )


def q_translate_regex(spark, sf_dir):
    from data_prepper_spark.operators.translate import translate_regex

    ev = _t(spark, sf_dir, "events")
    out = translate_regex(
        ev,
        "props",
        "k_class",
        {r'"k": 9[0-9]': "high", r'"k": [5-8][0-9]': "mid"},
        default="low",
    )
    return out.groupBy("k_class").agg(F.count(F.lit(1)).alias("n"))


def q_trace_group_lookup(spark, sf_dir):
    """Left-join trace-group backfill against a group index table
    (otel_trace_group processor's OpenSearch terms query analog)."""
    from data_prepper_spark.operators.trace import trace_group_lookup

    spans = _spans(spark, sf_dir)
    index = (
        spans.where("traceGroup is not null")
        .groupBy("traceId")
        .agg(F.min("traceGroup").alias("traceGroup"))
    )
    out = trace_group_lookup(spans, index)
    return out.select("spanId", "traceGroup")


def q_obfuscate_redact(spark, sf_dir):
    from data_prepper_spark.operators.enrich import obfuscate

    ev = _t(spark, sf_dir, "events")
    out = obfuscate(ev, "props", patterns=[r"[0-9]+"], mask="***", target="props_masked")
    return out.select("event_id", "props_masked")


def q_user_agent_parse(spark, sf_dir):
    from data_prepper_spark.operators.enrich import user_agent

    ev = _t(spark, sf_dir, "events")
    ua = (
        F.when(F.col("event_id") % 4 == 0,
               F.format_string("Mozilla/5.0 (Windows NT 10.0) Chrome/%d.0", F.col("user_id") % 50 + 70))
        .when(F.col("event_id") % 4 == 1,
              F.format_string("Mozilla/5.0 (Macintosh; Mac OS X) Version/%d.1 Safari/605", F.col("user_id") % 10 + 10))
        .when(F.col("event_id") % 4 == 2,
              F.format_string("Mozilla/5.0 (X11; Linux x86_64) Firefox/%d.0", F.col("user_id") % 40 + 80))
        .otherwise(F.format_string("curl/%d.%d", F.col("user_id") % 8, F.col("event_id") % 10))
    )
    out = user_agent(ev.withColumn("ua", ua), "ua")
    return out.select(
        "event_id",
        F.col("user_agent.name").alias("browser"),
        F.col("user_agent.version").alias("version"),
        F.col("user_agent.os").alias("os"),
        F.col("user_agent.device").alias("device"),
    )


def q_anomaly_zscore(spark, sf_dir):
    from data_prepper_spark.operators.anomaly import zscore_anomalies

    ev = _t(spark, sf_dir, "events")
    out = zscore_anomalies(ev, ["event_type"], "value", threshold=2.5)
    return out.select("event_id", "event_type", F.round("deviation", 4).alias("deviation"))


def q_anomaly_rcf(spark, sf_dir):
    """Random-cut-forest anomalies per event_type (reference
    RandomCutForestMode analog; seeded per-group isolation forest via
    applyInPandas — deterministic, but the forest's random cuts are not
    SQL-expressible, so the driver records a rows-only check; the
    operator's behavior is pytest-verified on drift series and the cap
    contract)."""
    from data_prepper_spark.operators.anomaly import rcf_anomalies

    ev = _t(spark, sf_dir, "events")
    out = rcf_anomalies(ev, ["event_type"], "value", score_threshold=0.62)
    return out.select("event_id", "event_type", F.round("grade", 4).alias("grade"))


def q_kv_recursive(spark, sf_dir):
    """Recursive bracket-tree key_value (reference recursive:true mode;
    operators/parse.py key_value_recursive pandas UDF). The oracle
    CONSTRUCTS the expected nested JSON from the same columns, so the
    round-trip through the recursive parser is fully value-checked."""
    from data_prepper_spark.operators.parse import key_value_recursive

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("user=[id="), F.col("user_id").cast("string"),
            F.lit("&type="), F.col("event_type"),
            F.lit("]&seq="), F.col("event_id").cast("string"),
        ).alias("line"),
    )
    return key_value_recursive(ev, "line", "parsed").select("event_id", "parsed")


def q_csv_roundtrip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn(
        "line",
        F.format_string("%s,%d,%d", F.col("event_type"), F.col("user_id"), F.col("event_id")),
    )
    out = parse.csv_parse(ev, "line", ["etype", "uid", "eid"])
    return out.select(
        "event_id", "etype", F.col("uid").cast("long").alias("uid"), F.col("eid").cast("long").alias("eid")
    )


def q_mutate_event_ops(spark, sf_dir):
    from data_prepper_spark.operators import mutate

    ev = _t(spark, sf_dir, "events")
    ev = mutate.copy_values(ev, [{"from_key": "event_type", "to_key": "etype_copy"}])
    ev = mutate.rename_keys(ev, [{"from_key": "props", "to_key": "payload"}])
    ev = mutate.convert_entry_type(ev, "user_id", "string")
    ev = ev.withColumn(
        "kvs",
        F.array(
            F.struct(F.lit("uid").alias("k"), F.col("user_id").alias("v")),
            F.struct(F.lit("etype").alias("k"), F.col("etype_copy").alias("v")),
        ),
    )
    ev = mutate.list_to_map(ev, "kvs", "kv_map", key_name="k", value_key="v")
    ev = mutate.delete_entries(ev, ["kvs", "etype_copy", "ts", "value"])
    return ev.select(
        "event_id",
        "payload",
        F.col("kv_map")["uid"].alias("uid_val"),
        F.col("kv_map")["etype"].alias("etype_val"),
    )


HIST_BOUNDS = [0.0, 50.0, 100.0, 250.0, 400.0]


def q_otel_histogram(spark, sf_dir):
    from data_prepper_spark.operators.metrics import histogram_buckets

    ev = _t(spark, sf_dir, "events")
    out = histogram_buckets(ev, ["event_type"], "value", HIST_BOUNDS)
    # arrays serialized to csv strings: the driver's canonicalizer can't
    # hash array cells (round-1 red row)
    return out.select(
        "event_type",
        F.concat_ws(",", F.col("bucketCounts").cast("array<string>")).alias("bucketCounts"),
        F.concat_ws(",", F.col("explicitBounds").cast("array<string>")).alias("explicitBounds"),
        F.round("min", 4).alias("min"),
        F.round("max", 4).alias("max"),
        F.round("sum", 4).alias("sum"),
        "count",
    )


def q_otel_gauge_sum(spark, sf_dir):
    from data_prepper_spark.operators.metrics import normalize_gauge_sum

    ev = _t(spark, sf_dir, "events").withColumn(
        "kind", F.when(F.col("event_id") % 2 == 0, "gauge").otherwise("sum")
    )
    out = normalize_gauge_sum(ev)
    return out.select(
        "event_id",
        F.col("metric.kind").alias("kind"),
        F.round(F.col("metric.value"), 4).alias("value"),
        F.col("metric.isMonotonic").alias("is_monotonic"),
        F.col("metric.aggregationTemporality").alias("temporality"),
    )


def q_otel_summary(spark, sf_dir):
    """OTel Summary quantiles (JacksonSummary). percentile_approx is exact
    below its accuracy parameter (10k), so for these group sizes it equals
    DuckDB's quantile_disc — a true oracle check, not a tolerance test."""
    from data_prepper_spark.operators.metrics import summary_quantiles

    ev = _t(spark, sf_dir, "events")
    out = summary_quantiles(ev, ["event_type"], "value", [0.5, 0.9])
    return out.select(
        "event_type",
        F.concat_ws(
            ",", F.transform("quantileValues", lambda x: F.round(x, 4)).cast("array<string>")
        ).alias("quantileValues"),
        F.lit("0.5,0.9").alias("quantiles"),
        F.round("sum", 4).alias("sum"),
        "count",
    )


def q_pipeline_yaml(spark, sf_dir):
    """Full reference-shaped YAML pipeline (source -> processors -> route ->
    sink) compiled to one DataFrame via data_prepper_spark.pipeline."""
    from data_prepper_spark.pipeline import PipelineRunner

    ev = _t(spark, sf_dir, "events")
    model = {
        "events-pipeline": {
            "source": {"dataframe": {"name": "events"}},
            "processor": [
                {"add_entries": {"entries": [{"key": "label", "format": "${event_type}:${user_id}"}]}},
                {"uppercase_string": {"with_keys": ["event_type"]}},
                {"drop_events": {"drop_when": "/value < 50"}},
                {
                    "translate": {
                        "source": "event_type",
                        "target": "cat",
                        "map": {"CLICK": "ui", "VIEW": "ui", "ERROR": "ops"},
                        "default": "other",
                    }
                },
            ],
            "routes": [{"ui_high": '/cat == "ui" and /value >= 400'}],
            "sink": [{"stdout": {"routes": ["ui_high"]}}],
        }
    }
    runner = PipelineRunner(spark, model, dataframes={"events": ev})
    sdf = runner.sink_frames("events-pipeline")[0][1]
    return sdf.select("event_id", "label", "cat", F.round("value", 4).alias("value"))


def q_pipeline_yaml_trace(spark, sf_dir):
    """Reference-shaped trace-analytics pipeline graph (the
    examples/dev/trace-analytics-sample-app/resources/pipelines.yaml
    topology): entry pipeline fans out to a raw pipeline
    (otel_trace_raw trace-group fill + geoip enrichment via the mmdb
    reader) and a service-map pipeline (service_map_stateful), all
    through the YAML PROCESSORS registry (VERDICT r4 next #3)."""
    import tempfile

    from data_prepper_spark.operators.mmdb import write_mmdb
    from data_prepper_spark.pipeline import PipelineRunner

    spans = _spans(spark, sf_dir)
    # one root per trace (as in q_trace_group_fill) so the fill is 1:1
    roots = spans.where("parentSpanId is null").groupBy("traceId").agg(
        F.min("event_id").alias("event_id")
    )
    one_root = spans.join(roots, ["traceId", "event_id"])
    spans_one = spans.where("parentSpanId is not null").unionByName(one_root)
    spans_ip = spans_one.withColumn(
        "ip", F.format_string("10.%d.0.1", F.col("traceId").cast("long") % 200)
    )
    # GEO_RANGES as a MaxMind-format fixture: one /16 network per 65536 span
    mmdb_path = os.path.join(tempfile.gettempdir(), "dps_pipeline_trace_geo.mmdb")
    nets = []
    for lo, hi, cc in GEO_RANGES:
        for base in range(lo, hi + 1, 65536):
            nets.append(
                (f"{base >> 24}.{(base >> 16) & 255}.0.0/16",
                 {"country": {"iso_code": cc}})
            )
    write_mmdb(mmdb_path, nets)
    model = {
        "entry-pipeline": {
            "source": {"dataframe": {"name": "spans"}},
            "sink": [
                {"pipeline": {"name": "raw-pipeline"}},
                {"pipeline": {"name": "service-map-pipeline"}},
            ],
        },
        "raw-pipeline": {
            "source": {"pipeline": {"name": "entry-pipeline"}},
            "processor": [
                {"otel_trace_raw": {}},
                {"geoip": {
                    "database_path": mmdb_path,
                    "keys": [{"key": {
                        "source": "ip", "target": "client",
                        "attributes": ["country_iso_code"],
                    }}],
                }},
            ],
            "sink": [{"stdout": {}}],
        },
        "service-map-pipeline": {
            "source": {"pipeline": {"name": "entry-pipeline"}},
            "processor": [{"service_map_stateful": {}}],
            "sink": [{"stdout": {}}],
        },
    }
    runner = PipelineRunner(spark, model, dataframes={"spans": spans_ip})
    raw_out = runner.sink_frames("raw-pipeline")[0][1]
    edges = runner.sink_frames("service-map-pipeline")[0][1]
    deg = edges.groupBy("source").agg(
        F.countDistinct("destination").alias("n_downstream")
    )
    return (
        raw_out.join(deg, raw_out["serviceName"] == deg["source"], "left")
        .select(
            "spanId", "traceGroup",
            F.col("client_country_iso_code"),
            F.coalesce("n_downstream", F.lit(0).cast("long")).alias("n_downstream"),
        )
    )


def _extra_oracles() -> dict[str, str]:
    toks = duckdb_tokens_sql("text")
    base = f"select doc_id, {toks} as toks from documents"
    spans_sql = """
        select cast(user_id as varchar) as traceId,
               printf('%d-%d', user_id, event_id) as spanId,
               case when event_id % 3 <> 0
                    then printf('%d-%d', user_id, (event_id // 7) * 7) end as parentSpanId,
               event_type as serviceName,
               case when event_id % 3 = 0 then event_type end as traceGroup,
               event_id
        from events"""
    return {
        "agg_put_all": """
            select user_id, event_type, event_id, ts from events
            qualify row_number() over (partition by user_id order by ts desc, event_id desc) = 1""",
        "agg_append": """
            select user_id, event_type,
                   array_to_string(list_sort(list(cast(round(value * 10000) as bigint))), ',') as rv
            from events group by user_id, event_type""",
        "agg_percent_sampler": """
            with r as (select event_id, event_type,
                              row_number() over (partition by event_type order by ts, event_id) as rn,
                              count(*) over (partition by event_type) as n
                       from events)
            select event_id, event_type from r where rn <= ceil(n * 0.25)""",
        "agg_tail_sampler": """
            select event_id, user_id, event_type from events
            where user_id in (select user_id from events where event_type = 'error')""",
        "agg_rate_limiter": """
            select event_id, event_type, ts from events
            qualify row_number() over (partition by event_type, date_trunc('second', ts)
                                       order by ts, event_id) = 1""",
        "service_map_edges": f"""
            with spans as ({spans_sql})
            select distinct p.serviceName as source, c.serviceName as destination
            from spans c join spans p on c.parentSpanId = p.spanId
            where p.serviceName <> c.serviceName""",
        "trace_group_fill": f"""
            with spans as ({spans_sql}),
            roots as (select * from spans where parentSpanId is null
                      qualify row_number() over (partition by traceId order by event_id) = 1),
            one as (select * from spans where parentSpanId is not null
                    union all by name select * from roots)
            select o.spanId, coalesce(o.traceGroup, r.traceGroup) as traceGroup
            from one o left join roots r on o.traceId = r.traceId""",
        "geo_enrich": f"""
            with ev as (select event_id,
                        printf('10.%d.%d.%d', user_id % 200, event_id % 256,
                               (user_id * 7) % 254 + 1) as ip,
                        (10 * 16777216) + (user_id % 200) * 65536
                          + (event_id % 256) * 256 + ((user_id * 7) % 254 + 1) as ip_num
                        from events),
            geo(net_lo, net_hi, country) as (values {", ".join(f"({lo}, {hi}, '{c}')" for lo, hi, c in GEO_RANGES)})
            select event_id, ip, country
            from ev left join geo on ip_num between net_lo and net_hi""",
        "split_string": """
            select event_id,
                   event_type || '~' || cast(user_id as varchar) || '~' || cast(event_id as varchar) as parts,
                   3 as n_parts
            from events""",
        "translate_regex": """
            select case when regexp_matches(props, '"k": 9[0-9]') then 'high'
                        when regexp_matches(props, '"k": [5-8][0-9]') then 'mid'
                        else 'low' end as k_class, count(*) as n
            from events group by 1""",
        "trace_group_lookup": f"""
            with spans as ({spans_sql}),
            idx as (select traceId, min(traceGroup) as tg from spans
                    where traceGroup is not null group by traceId)
            select s.spanId, coalesce(s.traceGroup, i.tg) as traceGroup
            from spans s left join idx i on s.traceId = i.traceId""",
        "agg_composite_page": f"""
            with tk as (select doc_id, lang, n_chars, {toks} as toks from documents),
            m as (select lang, n_chars from tk
                  where len(list_filter(toks, x -> x in ('key', 'scan', 'table', 'value'))) > 0),
            g as (select lang, floor(n_chars / 100.0) * 100.0 as chars,
                         cast(count(*) as bigint) as doc_count
                  from m where lang is not null and n_chars is not null
                  group by 1, 2)
            select lang, chars, doc_count from g
            where lang > 'de' or (lang = 'de' and chars > 200.0)
            order by lang, chars limit 5""",
        "dsl_collapse": """
            with g as (
              select doc_id, lang, n_chars,
                     row_number() over (
                       partition by coalesce(lang, 'N' || cast(doc_id as varchar))
                       order by n_chars desc, doc_id asc) as rn
              from documents),
            s as (select doc_id, lang, n_chars from g where rn = 1)
            select cast(row_number() over (order by n_chars desc, doc_id asc) as int) as rank,
                   doc_id, cast(1.0 as double) as score, n_chars, lang
            from s order by rank limit 8""",
        "ft_suggest_terms": f"""
            with tk as ({base}),
            d as (select term, cast(count(*) as bigint) as df
                  from (select distinct doc_id, unnest(toks) as term from tk)
                  group by term),
            t(token) as (values ('scen'), ('grup'), ('kay'), ('tabl')),
            cand as (select t.token, d.term as suggestion,
                            levenshtein(d.term, t.token) as distance, d.df
                     from d join t on substr(d.term, 1, 1) = substr(t.token, 1, 1)
                                  and abs(len(d.term) - len(t.token)) <= 2
                                  and d.term <> t.token
                                  and levenshtein(d.term, t.token) <= 2),
            r as (select *, cast(row_number() over (
                     partition by token
                     order by distance asc, df desc, suggestion asc) as int) as rank
                  from cand)
            select token, rank, suggestion, distance, df from r where rank <= 5""",
        "events_date_range": """
            select r.key, r."from", r."to",
                   (select count(*) from events e
                    where (r."from" is null or e.ts >= cast(r."from" as timestamp))
                      and (r."to" is null or e.ts < cast(r."to" as timestamp))) as doc_count
            from (values ('*-2024-01-08', cast(null as varchar), '2024-01-08'),
                         ('mid', '2024-01-08', '2024-01-20'),
                         ('2024-01-20-*', '2024-01-20', cast(null as varchar))) r(key, "from", "to")""",
        "dsl_more_like_this": f"""
            with base as (select doc_id, {toks} as toks from documents),
            stats as (select count(*) as n from base),
            src as (select term, cast(count(*) as bigint) as tf
                    from (select unnest(toks) as term from base where doc_id = 3)
                    group by term),
            dfs as (select term, cast(count(*) as bigint) as df
                    from (select distinct doc_id, unnest(toks) as term from base)
                    where term in (select term from src) group by term),
            qt as (select s.term
                   from src s join dfs using(term), stats
                   where df >= 2
                   order by -round(tf * ln(1 + (n - df + 0.5) / (df + 0.5)), 6), s.term
                   limit 8),
            b2 as (select doc_id, len(toks) as dl, toks from base),
            st2 as (select count(*) as n, avg(dl) as avgdl from b2),
            posts as (select doc_id, dl, term, count(*) as tf
                      from (select doc_id, dl, unnest(toks) as term from b2)
                      where term in (select term from qt) group by doc_id, dl, term),
            tdf as (select term, cast(count(*) as bigint) as df from posts group by term),
            sc as (select doc_id,
                     round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                           * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) as score
                   from posts join tdf using(term), st2 group by doc_id)
            select cast(row_number() over (order by score desc, doc_id asc) as int) as rank,
                   doc_id, score
            from sc where doc_id != 3 order by score desc, doc_id asc limit 10""",
        "otlp_trace_decode": """
            select printf('%032x', user_id) as traceId,
                   printf('%016x', event_id) as spanId,
                   case when event_id % 3 <> 0
                        then printf('%016x', (event_id // 7) * 7) end as parentSpanId,
                   event_type as name,
                   cast(event_id % 5 as int) as kind,
                   1000 * event_id as startTime,
                   1000 * event_id + 10 * (user_id + 1) as endTime,
                   10 * (user_id + 1) as durationInNanos,
                   event_type as serviceName,
                   cast(event_id % 3 as int) as statusCode
            from events""",
        "pipeline_yaml_trace": f"""
            with spans as ({spans_sql}),
            roots as (select * from spans where parentSpanId is null
                      qualify row_number() over (partition by traceId order by event_id) = 1),
            one as (select * from spans where parentSpanId is not null
                    union all by name select * from roots),
            filled as (select o.spanId, o.traceId, o.serviceName,
                              coalesce(o.traceGroup, r.traceGroup) as traceGroup
                       from one o left join roots r on o.traceId = r.traceId),
            geo(net_lo, net_hi, country) as (values {", ".join(f"({lo}, {hi}, '{c}')" for lo, hi, c in GEO_RANGES)}),
            edges as (select distinct p.serviceName as source, c.serviceName as destination
                      from one c join one p on c.parentSpanId = p.spanId
                      where c.serviceName <> p.serviceName),
            deg as (select source, count(distinct destination) as n_downstream
                    from edges group by source)
            select f.spanId, f.traceGroup, g.country as client_country_iso_code,
                   coalesce(d.n_downstream, 0) as n_downstream
            from filled f
            left join geo g on (10 * 16777216) + (cast(f.traceId as bigint) % 200) * 65536 + 1
                               between g.net_lo and g.net_hi
            left join deg d on f.serviceName = d.source""",
        "obfuscate_redact": """
            select event_id, regexp_replace(props, '[0-9]+', '***', 'g') as props_masked
            from events""",
        "user_agent_parse": """
            select event_id,
                   case event_id % 4 when 0 then 'Chrome' when 1 then 'Safari'
                        when 2 then 'Firefox' else 'curl' end as browser,
                   case event_id % 4
                        when 0 then cast(user_id % 50 + 70 as varchar) || '.0'
                        when 1 then cast(user_id % 10 + 10 as varchar) || '.1'
                        when 2 then cast(user_id % 40 + 80 as varchar) || '.0'
                        else cast(user_id % 8 as varchar) || '.' || cast(event_id % 10 as varchar)
                   end as version,
                   case event_id % 4 when 0 then 'Windows' when 1 then 'Mac OS X'
                        when 2 then 'Linux' else 'Other' end as os,
                   'Other' as device
            from events""",
        "kv_recursive": """
            select event_id,
                   '{"user": {"id": "' || user_id || '", "type": "' || event_type
                   || '"}, "seq": "' || event_id || '"}' as parsed
            from events""",
        "anomaly_zscore": """
            with s as (select event_type, avg(value) as mu,
                              stddev_pop(value) as sigma
                       from events group by event_type)
            select event_id, e.event_type,
                   round((value - mu) / sigma, 4) as deviation
            from events e join s on e.event_type = s.event_type
            where sigma > 0 and abs((value - mu) / sigma) > 2.5""",
        "csv_roundtrip": """
            select event_id, event_type as etype, user_id as uid, event_id as eid
            from events""",
        "mutate_event_ops": """
            select event_id, props as payload,
                   cast(user_id as varchar) as uid_val, event_type as etype_val
            from events""",
        "pipeline_yaml": """
            with p as (
              select event_id,
                     event_type || ':' || cast(user_id as varchar) as label,
                     upper(event_type) as etype_u, value
              from events where value >= 50)
            select event_id, label,
                   case etype_u when 'CLICK' then 'ui' when 'VIEW' then 'ui'
                        when 'ERROR' then 'ops' else 'other' end as cat,
                   round(value, 4) as value
            from p
            where case etype_u when 'CLICK' then 'ui' when 'VIEW' then 'ui'
                       when 'ERROR' then 'ops' else 'other' end = 'ui'
              and value >= 400""",
        "otel_histogram": f"""
            select event_type,
                   array_to_string(list_value(
                     cast(sum(case when value <= 0 then 1 else 0 end) as bigint),
                     cast(sum(case when value > 0 and value <= 50 then 1 else 0 end) as bigint),
                     cast(sum(case when value > 50 and value <= 100 then 1 else 0 end) as bigint),
                     cast(sum(case when value > 100 and value <= 250 then 1 else 0 end) as bigint),
                     cast(sum(case when value > 250 and value <= 400 then 1 else 0 end) as bigint),
                     cast(sum(case when value > 400 then 1 else 0 end) as bigint)
                   ), ',') as bucketCounts,
                   '{",".join(str(float(b)) for b in HIST_BOUNDS)}' as explicitBounds,
                   round(min(value), 4) as min, round(max(value), 4) as max,
                   round(sum(value), 4) as sum, count(*) as count
            from events group by event_type""",
        "otel_summary": """
            select event_type,
                   array_to_string([round(quantile_disc(value, 0.5), 4),
                                    round(quantile_disc(value, 0.9), 4)], ',') as quantileValues,
                   '0.5,0.9' as quantiles,
                   round(sum(value), 4) as sum, count(*) as count
            from events group by event_type""",
        "otel_gauge_sum": """
            select event_id,
                   case when event_id % 2 = 0 then 'gauge' else 'sum' end as kind,
                   round(value, 4) as value,
                   case when event_id % 2 = 0 then null else true end as is_monotonic,
                   case when event_id % 2 = 0 then null else 'CUMULATIVE' end as temporality
            from events""",
        "events_date_histogram": """
            select make_timestamp(cast(floor(epoch(ts) / 21600) * 21600 as bigint) * 1000000) as key,
                   count(*) as doc_count
            from events group by 1 order by 1""",
    }



def q_ft_multi_match(spark, sf_dir):
    """OpenSearch multi_match over ["text^2", "text"] with most_fields
    scoring: factor = 2 + 1 = 3x the single-field match scores (the DSL
    compiler's multi_match leaf, query/dsl.py — equivalence to the
    compiler is pytest-asserted; the adhoc twin makes it oracle-checkable)."""
    out = bm25_topk_adhoc(_t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, 10)
    return out.select("rank", "doc_id", F.round(F.col("score") * 3, 4).alias("score"))


def q_ft_ids_filtered(spark, sf_dir):
    """OpenSearch ids + exists filters under a scoring match (DSL filter
    leaves, query/dsl.py): top-k among an explicit doc-id allowlist with a
    non-null attr, corpus-wide statistics (Lucene filter semantics)."""
    ids = ",".join(str(i) for i in range(0, 400, 7))
    return bm25_topk_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY, 10,
        doc_filter=f"doc_id in ({ids}) and lang is not null",
    )


def q_dsl_query_string(spark, sf_dir):
    """Lucene query_string syntax through the full DSL compiler, running
    index-free over the documents table (query/querystring.py parse ->
    query/dsl.py _AdhocCompiler — the same compiler class the indexed
    path uses, backend-swapped; parity with the index is pytest-asserted
    in tests/test_dsl.py). '+key +table scan -lang:fr': both must terms
    required, 'scan' an optional booster, French docs excluded."""
    from data_prepper_spark.query.dsl import search_adhoc

    return search_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"query_string": {"query": "+key +table scan -lang:fr"}},
        size=10, round_to=4,
    )


def q_dsl_search_highlight(spark, sf_dir):
    """The DSL search highlight block (query/dsl.py search_highlight /
    search_adhoc_highlight): top-k for a query_string plus a token-window
    snippet from the source table, the OpenSearch highlight analog (the
    index stores no content; OpenSearch likewise reads _source)."""
    from data_prepper_spark.query.dsl import search_adhoc_highlight

    return search_adhoc_highlight(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"query_string": {"query": "+key +table scan -lang:fr"}},
        size=10, round_to=4,
    )


def q_dsl_search_after(spark, sf_dir):
    """OpenSearch search-body request surface (query/dsl.py search_body):
    constant_score query, field sort with _doc tiebreaker, search_after
    cursor pagination (compiles to a WHERE under the top-k — O(size) deep
    paging, not O(from+size)), and _source includes."""
    from data_prepper_spark.query.dsl import search_body_adhoc

    return search_body_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {
            "query": {
                "constant_score": {
                    "filter": {"range": {"n_chars": {"gte": 200}}},
                    "boost": 2.5,
                }
            },
            "sort": [{"lang": "asc"}, {"_doc": "asc"}],
            "search_after": ["en", 150],
            "size": 12,
            "_source": ["lang", "n_chars"],
        },
    )


def q_agg_terms_substats(spark, sf_dir):
    """OpenSearch nested aggregations: a terms bucket agg with a stats
    metric sub-agg, computed in ONE groupBy (query/dsl.py _sub_agg_cols —
    sub-aggs never cost a second scan), rendered flat per the relational
    convention (s -> s_count/s_min/s_max/s_avg/s_sum)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    return aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"by_lang": {"terms": {"field": "lang", "size": 10},
                     "aggs": {"chars": {"stats": {"field": "n_chars"}}}}},
    )["by_lang"]


def q_agg_top_hits(spark, sf_dir):
    """OpenSearch top_hits sub-aggregation: per-bucket top-N documents,
    rendered one row per (bucket, hit) (query/dsl.py _bucket_agg terms
    branch — per-bucket row_number window on the bucket-key shuffle)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    return aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"by_lang": {"terms": {"field": "lang", "size": 5},
                     "aggs": {"top": {"top_hits": {
                         "size": 2, "sort": [{"n_chars": "desc"}]}}}}},
    )["by_lang"]


def q_agg_percentiles_chars(spark, sf_dir):
    """OpenSearch percentiles aggregation over the match set (exact
    linear-interpolated form — quantile_cont semantics; approx=true is
    the t-digest-class scale path, pytest-covered)."""
    from pyspark.sql import functions as F

    from data_prepper_spark.query.dsl import aggregations_adhoc

    out = aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"pct": {"percentiles": {"field": "n_chars",
                                 "percents": [5, 25, 50, 75, 95]}}},
    )["pct"]
    return out.select("percent", F.round("value", 4).alias("value"))


def q_agg_range_chars(spark, sf_dir):
    """OpenSearch range aggregation (from-inclusive / to-exclusive,
    empty buckets reported) over the match set of the standard query
    (query/dsl.py _bucket_agg, shared with the indexed aggs path)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    return aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"r": {"range": {"field": "n_chars",
                         "ranges": [{"to": 500}, {"from": 500, "to": 2000},
                                    {"from": 2000}]}}},
    )["r"]


def q_agg_histogram_chars(spark, sf_dir):
    """OpenSearch histogram aggregation (fixed numeric interval, bucket
    key = lower bound) over the match set of the standard query."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    return aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"h": {"histogram": {"field": "n_chars", "interval": 300}}},
    )["h"]


def q_dsl_dis_max(spark, sf_dir):
    """Lucene DisjunctionMaxQuery through the DSL compiler: score = best
    sub-query score + tie_breaker * the rest (query/dsl.py compile
    dis_max branch — one union + one groupBy, no N-way join)."""
    from data_prepper_spark.query.dsl import search_adhoc

    return search_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"dis_max": {"queries": [
            {"match": {"content": "key value"}},
            {"match": {"content": "table scan"}},
        ], "tie_breaker": 0.3}},
        size=10, round_to=4,
    )


def q_dsl_boosting(spark, sf_dir):
    """Lucene BoostingQuery: negative matches demote (score *
    negative_boost) instead of excluding — the down-ranking primitive
    must_not can't express (query/dsl.py compile boosting branch)."""
    from data_prepper_spark.query.dsl import search_adhoc

    return search_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"boosting": {
            "positive": {"match": {"content": "key table"}},
            "negative": {"term": {"lang": "fr"}},
            "negative_boost": 0.4,
        }},
        size=10, round_to=4,
    )


def q_agg_filters_buckets(spark, sf_dir):
    """OpenSearch filters aggregation: named filter buckets (a doc may
    land in several; empty buckets kept) with a metric sub-agg, all
    branches of one scan (query/dsl.py _bucket_agg filters branch)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    out = aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"f": {"filters": {"filters": {
            "short": {"range": {"n_chars": {"lt": 800}}},
            "fr": {"term": {"lang": "fr"}},
            "tagged": {"exists": {"field": "lang"}},
        }}, "aggs": {"chars": {"avg": {"field": "n_chars"}}}}},
    )["f"]
    return out.select("key", "doc_count", F.round("chars", 4).alias("chars"))


def q_agg_extended_stats(spark, sf_dir):
    """OpenSearch extended_stats over the match set: stats +
    sum_of_squares + population variance/std-deviation in ONE aggregate
    pass (query/dsl.py _bucket_agg extended_stats branch)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    out = aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"es": {"extended_stats": {"field": "n_chars"}}},
    )["es"]
    return out.select(
        "count", "min", "max", F.round("avg", 4).alias("avg"), "sum",
        F.round("sum_of_squares", 2).alias("sum_of_squares"),
        F.round("variance", 2).alias("variance"),
        F.round("std_deviation", 4).alias("std_deviation"),
    )


def q_agg_composite_page(spark, sf_dir):
    """OpenSearch composite aggregation: key-ordered bucket pages with an
    `after` cursor — the scalable bucket walk (O(size) per page via
    TakeOrderedAndProject, never a deep terms agg). Multi-source keys
    (terms x histogram) over the standard query's match set
    (query/dsl.py _bucket_agg composite branch)."""
    from data_prepper_spark.query.dsl import aggregations_adhoc

    return aggregations_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id", FT_QUERY,
        {"c": {"composite": {
            "sources": [
                {"lang": {"terms": {"field": "lang"}}},
                {"chars": {"histogram": {"field": "n_chars", "interval": 100}}},
            ],
            "size": 5,
            "after": {"lang": "de", "chars": 200.0},
        }}},
    )["c"]


def q_dsl_collapse(spark, sf_dir):
    """Search-body field collapsing: one best hit per lang group under
    the sort order, docs with a missing lang each their own group
    (query/dsl.py _search_body collapse — a row_number window on the
    collapse key BEFORE pagination)."""
    from data_prepper_spark.query.dsl import search_body_adhoc

    return search_body_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"query": {"match_all": {}},
         "collapse": {"field": "lang"},
         "sort": [{"n_chars": "desc"}, {"_doc": "asc"}],
         "_source": ["lang"],
         "size": 8},
        round_to=4,
    )


def q_ft_suggest_terms(spark, sf_dir):
    """Term suggester ("did you mean"): per misspelled token, dictionary
    candidates within the edit budget ranked (distance asc, df desc) —
    one dictionary pass with Lucene's first-char/length pruning
    (query/suggest.py; indexed twin reads dict_df incl. NRT segments)."""
    from data_prepper_spark.query.suggest import suggest_terms_adhoc

    return suggest_terms_adhoc(
        _t(spark, sf_dir, "documents"), "text", "scen grup kay tabl", size=5, max_edits=2
    )


def q_events_date_range(spark, sf_dir):
    """OpenSearch date_range aggregation over the events stream: from
    inclusive / to exclusive timestamp buckets, empty buckets kept
    (query/dsl.py _bucket_agg date_range — one scan, explode pattern)."""
    from data_prepper_spark.query.dsl import bucket_agg_adhoc

    return bucket_agg_adhoc(
        _t(spark, sf_dir, "events"),
        {"date_range": {"field": "ts", "ranges": [
            {"to": "2024-01-08"},
            {"from": "2024-01-08", "to": "2024-01-20", "key": "mid"},
            {"from": "2024-01-20"},
        ]}},
    )


def q_dsl_more_like_this(spark, sf_dir):
    """more_like_this as a DSL scoring leaf ({"like": {"_id": n}}):
    source-doc top tf*idf terms -> bool-OR BM25, source excluded —
    runs through the shared compiler seams, so the indexed and adhoc
    backends share term selection (query/dsl.py more_like_this branch;
    rank-parity with the dedicated operator is pytest-asserted)."""
    from data_prepper_spark.query.dsl import search_adhoc

    return search_adhoc(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        {"more_like_this": {"like": {"_id": 3}, "max_query_terms": 8,
                            "min_doc_freq": 2}},
        size=10, round_to=4,
    )


def q_otlp_trace_decode(spark, sf_dir):
    """OTLP protobuf trace decode with NO jar: deterministic
    ExportTraceServiceRequest payloads are wire-encoded from events
    (operators/otlp.py encode_traces_payload, the fixture writer), then
    decoded by the pure-Python wire reader (decode_otlp_traces — the
    otel-proto-common analog, reference otel-proto-common/.../
    OTelProtoCodec.java). The oracle recomputes every decoded field
    straight from events, so the round-trip proves the decoder against
    the public wire format."""
    import pandas as pd

    from data_prepper_spark.operators.otlp import (
        decode_otlp_traces,
        encode_traces_payload,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type")

    def enc(batches):
        for b in batches:
            payloads = []
            for u, e, t in zip(b["user_id"], b["event_id"], b["event_type"]):
                u, e = int(u), int(e)
                span = dict(
                    trace_id=u.to_bytes(16, "big"),
                    span_id=e.to_bytes(8, "big"),
                    name=t, kind=e % 5,
                    start=1000 * e, end=1000 * e + 10 * (u + 1),
                    status=e % 3,
                )
                if e % 3 != 0:
                    span["parent_span_id"] = ((e // 7) * 7).to_bytes(8, "big")
                payloads.append(encode_traces_payload(t, [span]))
            yield pd.DataFrame({"payload": payloads})

    return decode_otlp_traces(ev.mapInPandas(enc, "payload binary"))


def q_events_date_histogram(spark, sf_dir):
    """OpenSearch date_histogram with a fixed_interval of 6h over the
    events stream (query/dsl.py bucket_agg_adhoc — epoch-floor bucketing,
    the DSL aggs path without a query)."""
    from data_prepper_spark.query.dsl import bucket_agg_adhoc

    return bucket_agg_adhoc(
        _t(spark, sf_dir, "events"),
        {"date_histogram": {"field": "ts", "fixed_interval": "6h"}},
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ft_doc_stats": q_ft_doc_stats,
        "ft_dictionary": q_ft_dictionary,
        "ft_corpus_stats": q_ft_corpus_stats,
        "ft_postings": q_ft_postings,
        "ft_bm25_topk": q_ft_bm25_topk,
        "ft_bm25_topk2": q_ft_bm25_topk2,
        "ft_bm25_filtered": q_ft_bm25_filtered,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_top_revenue": q_q3_top_revenue,
        "q6_revenue": q_q6_revenue,
        "q5_local_supplier": q_q5_local_supplier,
        "events_parse_json": q_events_parse_json,
        "events_windowed_count": q_events_windowed_count,
        "events_histogram": q_events_histogram,
        "events_remove_duplicates": q_events_remove_duplicates,
        "events_route_counts": q_events_route_counts,
        "events_mutate_chain": q_events_mutate_chain,
        "translate_tiers": q_translate_tiers,
        "grok_roundtrip": q_grok_roundtrip,
        "kv_roundtrip": q_kv_roundtrip,
        "kv_advanced": q_kv_advanced,
        "grok_syslog": q_grok_syslog,
        "dissect_roundtrip": q_dissect_roundtrip,
        "date_roundtrip": q_date_roundtrip,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_clusters": q_dedup_clusters,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "minhash_verified_pairs": q_minhash_verified_pairs,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "phrase_search": q_phrase_search,
        "phrase_prox_topk": q_phrase_prox_topk,
        "phrase_sloppy": q_phrase_sloppy,
        "ft_prefix_topk": q_prefix_topk,
        "ft_fuzzy_topk": q_fuzzy_topk,
        "ft_facets": q_facet_counts,
        "ft_significant_terms": q_significant_terms,
        "ft_phrase_prefix_topk": q_phrase_prefix_topk,
        "ft_wildcard_topk": q_wildcard_topk,
        "ft_more_like_this": q_more_like_this,
        "ft_highlight": q_highlight,
        "phrase_sloppy_topk": q_phrase_sloppy_topk,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint_md5": q_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "training_data_pipeline": q_training_data_pipeline,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embed_top_pairs": q_embed_top_pairs,
        "embed_dup_clusters": q_embed_dup_clusters,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ft_delete_soft": q_ft_delete_soft,
        "agg_put_all": q_agg_put_all,
        "agg_append": q_agg_append,
        "agg_percent_sampler": q_agg_percent_sampler,
        "agg_tail_sampler": q_agg_tail_sampler,
        "agg_rate_limiter": q_agg_rate_limiter,
        "service_map_edges": q_service_map_edges,
        "trace_group_lookup": q_trace_group_lookup,
        "geo_enrich": q_geo_enrich,
        "split_string": q_split_string,
        "translate_regex": q_translate_regex,
        "trace_group_fill": q_trace_group_fill,
        "obfuscate_redact": q_obfuscate_redact,
        "user_agent_parse": q_user_agent_parse,
        "anomaly_zscore": q_anomaly_zscore,
        "anomaly_rcf": q_anomaly_rcf,
        "kv_recursive": q_kv_recursive,
        "csv_roundtrip": q_csv_roundtrip,
        "mutate_event_ops": q_mutate_event_ops,
        "pipeline_yaml": q_pipeline_yaml,
        "pipeline_yaml_trace": q_pipeline_yaml_trace,
        "otel_histogram": q_otel_histogram,
        "otel_gauge_sum": q_otel_gauge_sum,
        "otel_summary": q_otel_summary,
        "ft_multi_match": q_ft_multi_match,
        "ft_ids_filtered": q_ft_ids_filtered,
        "dsl_query_string": q_dsl_query_string,
        "dsl_search_highlight": q_dsl_search_highlight,
        "dsl_search_after": q_dsl_search_after,
        "agg_terms_substats": q_agg_terms_substats,
        "agg_top_hits": q_agg_top_hits,
        "agg_percentiles_chars": q_agg_percentiles_chars,
        "agg_range_chars": q_agg_range_chars,
        "agg_histogram_chars": q_agg_histogram_chars,
        "events_date_histogram": q_events_date_histogram,
        "dsl_dis_max": q_dsl_dis_max,
        "dsl_boosting": q_dsl_boosting,
        "agg_filters_buckets": q_agg_filters_buckets,
        "agg_extended_stats": q_agg_extended_stats,
        "otlp_trace_decode": q_otlp_trace_decode,
        "agg_composite_page": q_agg_composite_page,
        "dsl_collapse": q_dsl_collapse,
        "ft_suggest_terms": q_ft_suggest_terms,
        "events_date_range": q_events_date_range,
        "dsl_more_like_this": q_dsl_more_like_this,
    }


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_ft_oracles())
    out.update(_tpch_oracles())
    out.update(_events_oracles())
    out.update(_roundtrip_oracles())
    out.update(_textops_oracles())
    out.update(_extra_oracles())
    # minhash_lsh_pairs (raw candidates) / ann_lsh_topk / anomaly_rcf:
    # engine-hash-/forest-dependent — driver records rows-only checks.
    # minhash_lsh_pairs (raw candidates) / ann_lsh_topk: engine-hash-
    # dependent (xxhash64 minhash perms / signed projections) — driver
    # records rows-only checks. Their verified/exact siblings
    # (minhash_verified_pairs, ann_cosine_topk) are fully oracle-checked,
    # and simhash/simhash_pairs are oracle-checked via the md5-60-bit
    # signature DuckDB recomputes.
    return out
