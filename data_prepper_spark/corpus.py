"""Deterministic synthetic ``code_files`` corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint): repo, path, commit, lang, content — all
strings. Every value is a pure function of ``(seed, row_id)`` via a
vectorized splitmix64 PRNG, so the corpus is bit-identical regardless of
Spark partitioning, parallelism, or generation order. That property is what
lets the resume test (SURVEY §5.2) and the two-parallelism scaling bench run
on *identical* inputs.

Scale: row count = round(1_000_000 * sf). Generation is distributed
(``spark.range(n).mapInPandas``) — at a real 10^12-file design point the
corpus is an existing Iceberg table and this module is only the test rig.

Skew is intentional and Zipf-like on two axes:
  - repo file counts (hot orgs),
  - token frequencies (hot terms like ``the``/``int``/``return``/``i``),
so the salted posting build (index/build.py) has real skew to handle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = np.uint64(0x5EED_DA7A_F11E_5CAF)

CODE_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ["python", "java", "c", "go", "js", "md"]
_LANG_W = np.array([0.30, 0.25, 0.15, 0.10, 0.10, 0.10])
_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}

_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "None", "for", "in", "if", "else", "lambda", "yield"],
    "java": ["public", "static", "void", "class", "int", "return", "new", "final", "extends", "null", "this"],
    "c": ["int", "char", "void", "struct", "return", "static", "const", "sizeof", "for", "while", "if"],
    "go": ["func", "return", "package", "import", "var", "range", "defer", "chan", "go", "struct", "interface"],
    "js": ["function", "const", "let", "return", "var", "async", "await", "this", "new", "typeof", "export"],
    "md": ["the", "a", "of", "and", "to", "in", "is", "for", "with", "this", "that", "example"],
}

_SYLLABLES = [
    "parse", "read", "write", "buffer", "index", "token", "query", "score",
    "merge", "split", "hash", "block", "chunk", "node", "tree", "list",
    "count", "total", "value", "item", "cache", "flush", "batch", "shard",
    "term", "doc", "post", "rank", "sort", "scan", "emit", "state",
]
_HOT = ["the", "int", "return", "i", "x", "data", "get", "set", "new", "id"]


def _build_pools() -> dict[str, np.ndarray]:
    """Deterministic per-lang token pools (identifiers + keywords + punct)."""
    pools: dict[str, np.ndarray] = {}
    rng = np.random.Generator(np.random.Philox(key=int(SEED)))
    for lang in _LANGS:
        idents: list[str] = []
        for i, a in enumerate(_SYLLABLES):
            for j, b in enumerate(_SYLLABLES):
                k = (i * len(_SYLLABLES) + j) % 3
                if k == 0:  # camelCase
                    idents.append(a + b.capitalize())
                elif k == 1:  # snake_case
                    idents.append(a + "_" + b)
                else:  # ALL_CAPS
                    idents.append((a + "_" + b).upper())
        # Zipf head: hot terms repeated many times so low pool ranks are hot.
        pool = (
            _HOT * 40
            + _KEYWORDS[lang] * 20
            + idents
            + [w + "(" for w in _SYLLABLES]
            + [w + ");" for w in _SYLLABLES]
            + ["==", "!=", "+=", "->", "{", "}", "//", "#", "/*", "*/"]
        )
        rng.shuffle(idents)  # deterministic given SEED
        pools[lang] = np.array(pool, dtype=object)
    return pools


_POOLS = _build_pools()
_UTF8_COMMENT = "# комментарий 注释 ünïcödé"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row PRNG core (uint64 in/out)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    n = len(ids)
    ids_u = ids.astype(np.uint64)
    h0 = _splitmix64(ids_u ^ SEED)
    h1 = _splitmix64(h0)
    h2 = _splitmix64(h1)
    h3 = _splitmix64(h2)

    # repo: Zipf-ish org/proj via log-uniform rank (hot orgs get many files)
    org = np.minimum((99.0 ** _u01(h0)).astype(np.int64) - 1, 98)
    proj = (h1 % np.uint64(20)).astype(np.int64)
    repo = np.array([f"org{o}/proj{p}" for o, p in zip(org, proj)], dtype=object)

    lang_idx = np.searchsorted(np.cumsum(_LANG_W), _u01(h2), side="right")
    lang_idx = np.minimum(lang_idx, len(_LANGS) - 1)
    langs = np.array(_LANGS, dtype=object)[lang_idx]

    depth = 1 + (h3 % np.uint64(4)).astype(np.int64)
    mod_pool = np.array(_SYLLABLES, dtype=object)
    name_a = mod_pool[(h0 >> np.uint64(7)) % np.uint64(len(_SYLLABLES))]
    name_b = mod_pool[(h1 >> np.uint64(13)) % np.uint64(len(_SYLLABLES))]
    paths = np.empty(n, dtype=object)
    for i in range(n):
        parts = ["src"] + [str(mod_pool[int((int(h2[i]) >> (5 * d)) % len(_SYLLABLES))]) for d in range(int(depth[i]) - 1)]
        paths[i] = "/".join(parts) + f"/{name_a[i]}_{name_b[i]}.{_EXT[langs[i]]}"

    # commit: 40 hex chars from two derived u64s + row id (deterministic)
    c1 = _splitmix64(h3 ^ np.uint64(0xC0FFEE))
    c2 = _splitmix64(c1)
    commits = np.array(
        [f"{int(a):016x}{int(b):016x}{int(i) & 0xFFFFFFFF:08x}" for a, b, i in zip(c1, c2, ids_u)],
        dtype=object,
    )

    # content: log-uniform line count in [10, 400], ~7 tokens per line,
    # token ranks log-uniform over the pool (Zipf head = hot terms).
    n_lines = (10.0 * (40.0 ** _u01(h1 ^ np.uint64(0xABCD)))).astype(np.int64)
    n_tokens = n_lines * 7
    contents = np.empty(n, dtype=object)
    for i in range(n):
        nt = int(n_tokens[i])
        pos = np.arange(nt, dtype=np.uint64)
        g = _splitmix64((ids_u[i] * np.uint64(0x1000003)) + pos)
        pool = _POOLS[langs[i]]
        ranks = np.minimum((len(pool) ** _u01(g)).astype(np.int64) - 1, len(pool) - 1)
        toks = pool[ranks]
        lines = [" ".join(toks[j : j + 7]) for j in range(0, nt, 7)]
        body = "\n".join(lines)
        if int(ids_u[i]) % 97 == 0:  # >=1% multi-byte UTF-8 comments
            body = _UTF8_COMMENT + "\n" + body
        contents[i] = body

    return pd.DataFrame(
        {"repo": repo, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def generate_code_files(spark: SparkSession, sf: float, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: round(1_000_000*sf) rows."""
    n = int(round(1_000_000 * sf))
    parts = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy())

    return spark.range(0, n, 1, parts).mapInPandas(gen, CODE_FILES_SCHEMA)


def write_code_files(spark: SparkSession, sf: float, path: str) -> None:
    generate_code_files(spark, sf).write.mode("overwrite").parquet(path)
