"""TableIO seam (SURVEY §7.0).

All engine tables go through this thin layer. In this sandbox it is a
Parquet-directory catalog; on a real cluster with ``iceberg-spark-runtime``
on the classpath (spark-submit --packages) set ``DPS_CATALOG=iceberg`` and
the same names resolve to Iceberg tables (ACID commits give the per-unit
checkpoint atomicity that the parquet fallback approximates with
directory-level overwrites).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# Tables that are replaced wholesale by index maintenance (refresh /
# dictionary merge). In the parquet catalog each replacement writes a new
# `<name>.gen-N` directory and then atomically swaps a pointer file
# (`_generations`, written tmp+rename — POSIX-atomic), so a crash mid-swap
# leaves the previous generation fully readable: the Iceberg
# snapshot-commit semantics, approximated for plain directories. On the
# Iceberg catalog `createOrReplace` is already an atomic snapshot commit
# and the pointer layer is a no-op.
GEN_TABLES = ("posting_blocks", "dictionary")
_GEN_FILE = "_generations"


class TableIO:
    def __init__(self, root: str):
        self.root = root
        self.catalog = os.environ.get("DPS_CATALOG", "parquet")

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -------------------------------------------------- generation layer --
    def gen_state(self) -> dict[str, int]:
        """Current generation per versioned table ({} = all at gen 0, the
        un-suffixed directory name)."""
        if self.catalog != "parquet":
            return {}
        p = self.path(_GEN_FILE)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def set_gen_state(self, **updates: int) -> None:
        """Atomically advance generation pointers (single rename = the
        commit point; every key updates together or not at all)."""
        assert self.catalog == "parquet", "iceberg catalog swaps via snapshot commit"
        state = self.gen_state()
        state.update(updates)
        os.makedirs(self.root, exist_ok=True)
        tmp = self.path(_GEN_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path(_GEN_FILE))

    def resolved(self, name: str) -> str:
        """Map a logical table name to its current-generation directory."""
        base = name.split("/", 1)[0]
        if base in GEN_TABLES:
            g = self.gen_state().get(base, 0)
            if g:
                return f"{base}.gen-{g}" + name[len(base):]
        return name

    def rpath(self, name: str) -> str:
        return self.path(self.resolved(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self.rpath(name))

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
        w.parquet(self.rpath(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.catalog == "iceberg":
            return spark.table(f"dps.{name.replace('/', '_')}")
        return spark.read.parquet(self.rpath(name))

    def drop(self, spark: SparkSession | None, name: str) -> None:
        if self.catalog == "iceberg":
            assert spark is not None
            spark.sql(f"drop table if exists dps.{name.replace('/', '_')}")
            return
        import shutil

        shutil.rmtree(self.path(name), ignore_errors=True)
