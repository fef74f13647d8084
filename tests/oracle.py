"""Deliberately-naive pure-Python reference implementation (the oracle).

Mirrors the reference system's golden e2e assertions (SURVEY §5): for a fixed
query set, the Spark engine's top-k (doc_id, score) must match this oracle
exactly in rank and to 1e-6 in score.

Includes a from-scratch XXH64 so ``doc_id = xxhash64(repo, path, commit)``
can be recomputed independently of Spark (Spark chains the seed across
columns: h = xxh64(utf8(c0), 42); h = xxh64(utf8(c1), h); ...).
"""

from __future__ import annotations

import math
from collections import Counter

from data_prepper_spark.analyzer import tokenize_py

K1 = 1.2
B = 0.75

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (unsigned). Spark's XxHash64 over binary/string payloads."""
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_cols(*values: str, seed: int = 42) -> int:
    """Signed int64, chaining seed across columns like Spark's xxhash64()."""
    h = seed
    for v in values:
        h = xxh64(v.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_id_for(repo: str, path: str, commit: str) -> int:
    return spark_xxhash64_cols(repo, path, commit)


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_topk(
    docs: list[tuple[int, str]],
    query_text: str,
    k: int,
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, int, float]]:
    """docs = [(doc_id, content)]; returns [(rank, doc_id, score)].

    Deterministic: query terms deduped then sorted ascending before the
    float sum (pins summation order); ties broken score DESC, doc_id ASC.
    """
    toks = {d: tokenize_py(c) for d, c in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n if n else 0.0
    terms = sorted(set(tokenize_py(query_text)))
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    scores: dict[int, float] = {}
    for d, tk in toks.items():
        tf = Counter(tk)
        dl = len(tk)
        s = 0.0
        for t in terms:
            if tf.get(t) and dfs[t]:
                s += idf(n, dfs[t]) * (tf[t] * (k1 + 1)) / (tf[t] + k1 * (1 - b + b * dl / avgdl))
        if s > 0.0:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
