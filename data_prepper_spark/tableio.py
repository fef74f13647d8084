"""TableIO seam (SURVEY §7.0).

All engine tables go through this thin layer. In this sandbox it is a
Parquet-directory catalog; on a real cluster with ``iceberg-spark-runtime``
on the classpath (spark-submit --packages) set ``DPS_CATALOG=iceberg`` and
the same names resolve to Iceberg tables (ACID commits give the per-unit
checkpoint atomicity that the parquet fallback approximates with
directory-level overwrites).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, root: str):
        self.root = root
        self.catalog = os.environ.get("DPS_CATALOG", "parquet")

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        options: dict[str, str] | None = None,
    ) -> None:
        if self.catalog == "iceberg":
            w = df.writeTo(f"dps.{name.replace('/', '_')}")
            for k, v in (options or {}).items():
                w = w.option(k, v)
            (w.createOrReplace() if mode == "overwrite" else w.append())
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.catalog == "iceberg":
            return spark.table(f"dps.{name.replace('/', '_')}")
        return spark.read.parquet(self.path(name))

    def drop(self, spark: SparkSession | None, name: str) -> None:
        if self.catalog == "iceberg":
            assert spark is not None
            spark.sql(f"drop table if exists dps.{name.replace('/', '_')}")
            return
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)
