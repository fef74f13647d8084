"""data_prepper_spark — a PySpark-native analytics + fulltext-index engine.

A from-scratch re-expression of the capabilities of the reference system
(OpenSearch Data Prepper, see SURVEY.md) as idiomatic PySpark:

- ``analyzer``     code-aware tokenization as pure Spark SQL expressions
- ``index``        inverted-index build (docs / postings / dictionary /
                   compressed block-max posting blocks) with skew-aware
                   salted repartition and resumable per-partition ledger
- ``query``        BM25 top-k (DataFrame path) + block-max WAND pruning
- ``operators``    the Data Prepper processor surface (mutate / parse /
                   aggregate / route / dedupe / similarity / text stats)
- ``expression``   Data Prepper expression language -> Spark Column
- ``sources``/``sinks``  codec-aware readers/writers
- ``corpus``       deterministic synthetic ``code_files`` generator

Everything is DataFrame-first: Catalyst owns pushdown/pruning/codegen; the
only Python on the hot path is Arrow-vectorized (pandas UDFs / mapInPandas).
"""

__version__ = "0.1.0"
