"""Interleaved A/B of the batch build path across two CODE VERSIONS
(repo head vs a git worktree of an older commit), each run in its own
subprocess with its own SparkSession so the two package versions never
share an interpreter. Per NOTES.md discipline: <=8-core sessions,
interleaved rounds, compare best-of-K.

    python scripts/build_ab_run.py [k] [worktree_path]

Env: DPS_AB_SF sets the corpus scale (default 0.01 = 10k docs); each
scale gets its own cached corpus dir under .data/.
"""

from __future__ import annotations

import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(pythonpath: str, corpus: str, out: str) -> float:
    env = dict(os.environ, PYTHONPATH=pythonpath)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/build_ab_probe.py"), corpus, out],
        env=env, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"BUILD_SEC ([0-9.]+)", p.stdout)
    if not m:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise RuntimeError(f"probe failed under {pythonpath}")
    return float(m.group(1))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    old = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".ab_r2")
    sf = float(os.environ.get("DPS_AB_SF", "0.01"))
    suffix = "" if sf == 0.01 else f"_{sf}"
    corpus = os.path.join(REPO, f".data/ab_corpus{suffix}")
    if not os.path.isdir(corpus):
        sys.path.insert(0, REPO)
        from data_prepper_spark.corpus import write_code_files
        from data_prepper_spark.session import get_spark

        s = get_spark("ab-gen", cores=8, shuffle_partitions=16)
        write_code_files(s, sf, corpus)
        s.stop()
    runs: dict[str, list[float]] = {"head": [], "old": []}
    for i in range(k):
        for name, pp in (("head", REPO), ("old", old)):
            sec = run_once(pp, corpus, os.path.join(REPO, f".data/ab_build_{name}"))
            runs[name].append(sec)
            print(f"round {i} {name}: {sec:.3f}s", flush=True)
    for name, r in runs.items():
        print(f"{name}: best={min(r):.3f} median={statistics.median(r):.3f} runs={[round(x,2) for x in r]}")
    delta = (min(runs["head"]) - min(runs["old"])) / min(runs["old"]) * 100
    print(f"head vs old (best): {delta:+.1f}%")


if __name__ == "__main__":
    main()
