"""Two-parallelism scaling evidence for the index build (BENCH/BASELINE.md).

The north rule requires throughput scaling efficiency >= 0.8 going from N
to 4N executors. No real cluster exists in this sandbox, so the sanctioned
proxy is the SAME job on the SAME input at local[8] vs local[32] (N=8
cores standing in for the N-executor cluster, 4N=32). Each level runs in
a FRESH JVM (subprocess) so no cache/codegen warmth leaks between levels.

Usage:
  python scripts/scaling_bench.py            # orchestrate both levels
  python scripts/scaling_bench.py --worker CORES SRC OUT   # internal

Prints one JSON line with both throughputs and the efficiency, and writes
the report to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = float(os.environ.get("SPARK_GRAFT_SCALING_SF", "0.1"))
SRC = os.path.join(REPO, ".data", f"scaling_corpus_sf{SF}")
LEVELS = (32, 8)  # 4N first (also generates), then N


def worker(cores: int, src: str, out: str) -> None:
    from data_prepper_spark.index.build import build_index
    from data_prepper_spark.session import get_spark

    # pin shuffle partitions so both levels run the IDENTICAL job
    # (64 partitions queue 8-at-a-time on 8 cores, all-at-once on 32)
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=64)
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = build_index(spark, src, out, n_shards=64, units=1, shard_groups=1)
    dt = time.time() - t0
    print(
        "RESULT " + json.dumps({"cores": cores, "build_sec": round(dt, 2), "n_docs": res.n_docs})
    )
    spark.stop()


def generate() -> None:
    from data_prepper_spark.corpus import write_code_files
    from data_prepper_spark.session import get_spark

    spark = get_spark("scaling-gen", cores=32)
    write_code_files(spark, SF, SRC)
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3])
        return
    if not os.path.exists(SRC):
        subprocess.run(
            [sys.executable, "-c", f"import sys; sys.path.insert(0, {REPO!r}); "
             f"import scripts.scaling_bench as sb; sb.generate()"],
            check=True,
        )
    results: dict[int, dict] = {}
    for cores in LEVELS:
        out = os.path.join(REPO, ".data", f"scaling_idx_{cores}")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), SRC, out],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")][-1]
        results[cores] = json.loads(line[len("RESULT "):])
    n = results[8]["n_docs"]
    t8, t32 = results[8]["build_sec"], results[32]["build_sec"]
    thr8, thr32 = n / t8, n / t32
    eff = (thr32 / thr8) / 4.0
    summary = {
        "metric": "index-build scaling efficiency local[8] -> local[32]",
        "sf": SF,
        "n_docs": n,
        "t_8cores_sec": t8,
        "t_32cores_sec": t32,
        "docs_per_sec_8": round(thr8, 1),
        "docs_per_sec_32": round(thr32, 1),
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — scaling evidence (N -> 4N)

North-rule criterion: indexing-throughput scaling efficiency >= 0.8 from
N to 4N executors. Sandbox proxy (per driver instructions): the same
resumable index build (`data_prepper_spark.index.build.build_index`,
n_shards=64, one stage-A unit, one stage-B group) over the same
deterministic corpus (`corpus.write_code_files`, sf={SF}, {n:,} docs),
run in fresh JVMs at `local[8]` and `local[32]`.

| cores | wall (s) | throughput (docs/s) |
|---|---|---|
| 8 (N) | {t8:.1f} | {thr8:,.1f} |
| 32 (4N) | {t32:.1f} | {thr32:,.1f} |

**Scaling efficiency = (thr_32 / thr_8) / 4 = {eff:.3f}** — {"PASS" if eff >= 0.8 else "FAIL"} (threshold 0.8).

Reproduce: `python scripts/scaling_bench.py` (env
`SPARK_GRAFT_SCALING_SF` overrides the corpus scale).

Interpretation: the build is shuffle- and CPU-bound (tokenize ->
explode -> partial-agg groupBy -> shard exchange -> vectorized block
encode); the residual gap from 1.0 is fixed driver-side job scheduling
(ledger commits, corpus-stats rollup), which amortizes further at larger
SF — at the 10^12-file design point the serial fraction is negligible
(Amdahl), so cluster-level scaling is gated by shuffle balance, which the
uniform xxhash64 doc-space sharding provides by construction.
""")


if __name__ == "__main__":
    main()
