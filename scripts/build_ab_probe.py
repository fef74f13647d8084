"""Subprocess probe for the build-path A/B: builds an index from a
prepared corpus dir and prints ONLY the build wall seconds (session
startup and corpus generation excluded). Run with PYTHONPATH pointing at
the code variant under test (repo head vs a git worktree of an older
commit).

    PYTHONPATH=/root/repo python scripts/build_ab_probe.py <corpus> <out> [n_shards]
"""

from __future__ import annotations

import shutil
import sys
import time


def main() -> None:
    corpus, out = sys.argv[1], sys.argv[2]
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from data_prepper_spark.index.build import build_index
    from data_prepper_spark.session import get_spark

    spark = get_spark("build-ab", cores=8, shuffle_partitions=16)
    # one untimed warmup build to absorb JVM/codegen warmup inside the run
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, corpus, out, n_shards=n_shards, units=1, shard_groups=1)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    build_index(spark, corpus, out, n_shards=n_shards, units=1, shard_groups=1)
    print(f"BUILD_SEC {time.time() - t0:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
