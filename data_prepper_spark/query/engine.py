"""Persistent query engine over a built index: the "search service" path.

``bm25_topk_wand`` (query/wand.py) is the one-shot path — every call pays
stats lookup + a cold scan. A real search deployment keeps the index hot:
this engine loads ``corpus_stats`` once, keeps a driver-side LRU of
dictionary rows for seen terms, and (optionally) persists the
``posting_blocks`` DataFrame so repeat queries scan executor memory
instead of parquet. That mirrors how the reference's delegate (OpenSearch/
Lucene) serves queries from page-cached segment files, and is the
configuration the p50/p95 latency numbers in BENCH are measured on.

At design scale the blocks table exceeds cluster RAM; ``persist_blocks``
uses MEMORY_AND_DISK so hot terms stay resident and cold ones spill —
the same economics as Lucene's page cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..analyzer import tokenize_py
from ..tableio import TableIO
from .common import idf as _idf
from .wand import _wand_shard


class IndexQueryEngine:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        persist_blocks: bool = True,
        shard_partitions: int = 8,
        exhaustive_threshold: int | None = None,
        result_cache_size: int = 0,
    ):
        self.spark = spark
        self.io = TableIO(index_dir)
        self.shard_partitions = shard_partitions
        # Opt-in result cache keyed by (query, k): a search tier's hottest
        # queries repeat, and the engine instance is pinned to one index
        # snapshot (generation resolved at construction), so cached rows
        # can never go stale within the instance. A hit skips the whole
        # distributed kernel; the trade is that a MISS materializes
        # inside topk (the caller's own .collect() then reads a
        # LocalTableScan, ~ms). Off by default to preserve the fully-lazy
        # one-job contract (NOTES.md documents why eager driver-side
        # shortcuts are usually a loss here — this one only pays on hits).
        from collections import OrderedDict

        self._result_cache_size = result_cache_size
        self._result_cache: OrderedDict[tuple[str, int], list] = OrderedDict()
        from .common import load_stats_full
        from .wand import EXHAUSTIVE_THRESHOLD

        self.n_docs, self.avgdl, self.layered = load_stats_full(spark, self.io)
        # layered (NRT) index: stored block-max wtf bounds embed a stale
        # avgdl; prune with avgdl-independent tf-only bounds instead of
        # forcing the exhaustive kernel (see _Cursor docstring)
        self._bounds = "tf" if self.layered else "wtf"
        self._thr = (
            EXHAUSTIVE_THRESHOLD if exhaustive_threshold is None else exhaustive_threshold
        )
        self._dict_cache: dict[str, dict | None] = {}
        # pin BOTH versioned tables to the generation current at
        # construction (rpath resolves the pointer once): with the GC
        # grace period (_gc_generations retain>=1) a refresh that bumps
        # the pointer leaves this engine's snapshot readable until it is
        # re-opened — resolving the dictionary per call would mix new-gen
        # df/idf stats with old-gen blocks. Layered segment side
        # dictionaries live INSIDE the pinned blocks generation, so the
        # same snapshot covers them.
        import os as _os

        self._dict_path = (
            self.io.rpath("dictionary") if self.io.exists("dictionary") else None
        )
        # live-docs snapshot, pinned at construction like the generation
        # pointer: deletes issued later need a new engine (same rule as
        # refresh). Serving kernels widen per-shard top-k by the tombstone
        # count so post-filter top-k stays exact; the count shrinks back
        # to zero when refresh purges — Lucene's delete-then-merge cost
        # curve. Zero overhead when no delete ever happened.
        from .common import tombstone_count

        self._n_tombstones = tombstone_count(spark, self.io)
        self._dead_ids: list[int] = (
            [
                int(r["doc_id"])
                for r in spark.read.parquet(self.io.path("tombstones"))
                .select("doc_id")
                .distinct()
                .collect()
            ]
            if 0 < self._n_tombstones <= 1000
            else []
        )
        _seg = self.io.rpath("posting_blocks/_segdict")
        self._segdict_path = _seg if _os.path.isdir(_seg) else None
        self.blocks = self.io.read(spark, "posting_blocks")
        self._prepartitioned = persist_blocks
        if persist_blocks:
            # persist already hash-partitioned by shard: the per-query plan
            # is then filter -> mapInPandas over cached partitions with NO
            # exchange (a partition holds only complete shards, so every
            # (shard, term) group is intact under any term filter). The
            # in-memory columnar cache prunes batches by term min/max, the
            # RAM analog of parquet row-group pruning.
            self.blocks = self.blocks.repartition(shard_partitions, "shard").persist(
                StorageLevel.MEMORY_AND_DISK
            )

    def _dict_df(self) -> DataFrame:
        if self.io.catalog != "parquet":
            from .common import dict_df

            return dict_df(self.spark, self.io)  # iceberg: snapshot commit
        cols = ["term", "df", "cf", "term_hash", "max_wtf"]
        base = (
            self.spark.read.parquet(self._dict_path).select(*cols)
            if self._dict_path is not None
            else None
        )
        if self._segdict_path is None:
            if base is None:
                return self.spark.createDataFrame(
                    [], "term string, df long, cf long, term_hash long, max_wtf double"
                )
            return base
        seg = self.spark.read.parquet(self._segdict_path).select(*cols)
        return (
            (base.unionByName(seg) if base is not None else seg)
            .groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max("term_hash").alias("term_hash"),
                F.max("max_wtf").alias("max_wtf"),
            )
        )

    def _term_stats(self, terms: list[str]) -> dict[str, dict]:
        missing = [t for t in terms if t not in self._dict_cache]
        if missing:
            rows = (
                self._dict_df()
                .where(F.col("term").isin(missing))
                .select("term", "term_hash", "df", "max_wtf")
                .collect()
            )
            found = {r["term"] for r in rows}
            for r in rows:
                self._dict_cache[r["term"]] = {
                    "df": int(r["df"]),
                    "hash": int(r["term_hash"]),
                    "idf": _idf(self.n_docs, int(r["df"])),
                    "max_wtf": float(r["max_wtf"]) if r["max_wtf"] is not None else 0.0,
                }
            for t in missing:
                if t not in found:
                    self._dict_cache[t] = None
        return {t: s for t in terms if (s := self._dict_cache.get(t)) is not None}

    _TOPK_SCHEMA = "rank int, doc_id long, score double"

    def topk(self, query_text: str, k: int = 10) -> DataFrame:
        """(rank int, doc_id long, score double) — block-max WAND per shard,
        TakeOrderedAndProject merge. One Spark job on the warm path."""
        if self._result_cache_size:
            return self.spark.createDataFrame(
                self.topk_rows(query_text, k), self._TOPK_SCHEMA
            )
        return self._topk_df(query_text, k)

    def topk_rows(self, query_text: str, k: int = 10) -> list:
        """Collected result rows, result cache consulted first — the
        SERVING-path API. Measured floor on this class of host: even a
        10-row LocalTableScan costs ~0.5 s per ``collect()`` (fixed
        driver/job overhead), so a cache that returns a DataFrame can
        never beat that floor; returning the cached rows directly makes a
        hit cost zero Spark jobs (~microseconds). Requires
        ``result_cache_size`` > 0; uncached engines compute and collect.
        """
        if not self._result_cache_size:
            return self._topk_df(query_text, k).collect()
        key = (query_text, k)
        hit = self._result_cache.get(key)
        if hit is not None:
            self._result_cache.move_to_end(key)
            return hit
        rows = self._topk_df(query_text, k).collect()
        self._result_cache[key] = rows
        if len(self._result_cache) > self._result_cache_size:
            self._result_cache.popitem(last=False)
        return rows

    def _drop_dead(self, df: DataFrame) -> DataFrame:
        """Live-docs filter over a (small) candidate frame: literal
        NOT-IN for few tombstones, broadcast anti-join beyond that."""
        if not self._n_tombstones:
            return df
        if self._dead_ids:
            return df.where(~F.col("doc_id").isin(self._dead_ids))
        t = (
            self.spark.read.parquet(self.io.path("tombstones"))
            .select("doc_id")
            .distinct()
        )
        return df.join(F.broadcast(t), "doc_id", "left_anti")

    def _topk_df(self, query_text: str, k: int) -> DataFrame:
        terms = sorted(set(tokenize_py(query_text)))
        tstats = self._term_stats(terms)
        empty = "rank int, doc_id long, score double"
        if not tstats:
            return self.spark.createDataFrame([], empty)
        hstats = {s["hash"]: s for s in tstats.values()}
        avgdl, n = self.avgdl, k + self._n_tombstones
        thr, bounds = self._thr, self._bounds

        import pandas as pd

        def per_shard(pdfs):
            buf: dict[int, list[pd.DataFrame]] = {}
            for pdf in pdfs:
                for s, grp in pdf.groupby("shard"):
                    buf.setdefault(int(s), []).append(grp)
            rows = []
            for s, parts in buf.items():
                rows.extend(_wand_shard(pd.concat(parts), hstats, avgdl, n, thr, bounds))
            yield (
                pd.DataFrame(rows, columns=["doc_id", "score"])
                if rows
                else pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
                )
            )

        filtered = self.blocks.where(F.col("term_hash").isin(list(hstats)))
        if not self._prepartitioned:
            filtered = filtered.repartition(self.shard_partitions, "shard")
        local = self._drop_dead(
            filtered.mapInPandas(per_shard, "doc_id long, score double")
        )
        topk = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql.window import Window

        # rank over the already-top-k rows: partitionBy(lit(0)) declares the
        # single partition explicitly (<= k rows), silencing WindowExec's
        # move-all-data warning without changing the plan's work
        w = F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return topk.select(w.alias("rank"), "doc_id", "score")

    def topk_batch(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """Evaluate MANY queries in ONE Spark job: (query_id string,
        rank int, doc_id long, score double).

        The blocks scan filters on the union of all query-term hashes and
        each shard partition runs WAND once per query over its (already
        grouped) blocks — per-query latency amortizes the job's fixed
        scheduling cost, the way a search tier batches its request queue.
        Results are rank-identical to per-query ``topk``.
        """
        per_q: dict[str, dict[int, dict]] = {}
        all_hashes: set[int] = set()
        for qid, text in queries.items():
            terms = sorted(set(tokenize_py(text)))
            tstats = self._term_stats(terms)
            hstats = {s["hash"]: s for s in tstats.values()}
            per_q[qid] = hstats
            all_hashes.update(hstats)
        empty = "query_id string, rank int, doc_id long, score double"
        if not all_hashes:
            return self.spark.createDataFrame([], empty)
        avgdl, n = self.avgdl, k + self._n_tombstones
        from .wand import batch_exhaustive_shard

        thr, bounds = self._thr, self._bounds

        import pandas as pd

        def per_shard(pdfs):
            buf: dict[int, list[pd.DataFrame]] = {}
            for pdf in pdfs:
                for s, grp in pdf.groupby("shard"):
                    buf.setdefault(int(s), []).append(grp)
            rows = []
            for s, parts in buf.items():
                shard_df = pd.concat(parts)
                if int(shard_df["n_docs"].sum()) <= thr:
                    # decode-once batch kernel: each term's blocks decoded
                    # a single time for ALL queries in the batch
                    rows.extend(batch_exhaustive_shard(shard_df, per_q, avgdl, n))
                    continue
                for qid, hstats in per_q.items():
                    if not hstats:
                        continue
                    sub = shard_df[shard_df["term_hash"].isin(list(hstats))]
                    if len(sub) == 0:
                        continue
                    for doc_id, score in _wand_shard(sub, hstats, avgdl, n, thr, bounds):
                        rows.append((qid, doc_id, score))
            yield (
                pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
                if rows
                else pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype="object"),
                        "doc_id": pd.Series(dtype="int64"),
                        "score": pd.Series(dtype="float64"),
                    }
                )
            )

        filtered = self.blocks.where(F.col("term_hash").isin(list(all_hashes)))
        if not self._prepartitioned:
            filtered = filtered.repartition(self.shard_partitions, "shard")
        local = self._drop_dead(
            filtered.mapInPandas(per_shard, "query_id string, doc_id long, score double")
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            local.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def close(self) -> None:
        try:
            self.blocks.unpersist()
        except Exception:
            pass
