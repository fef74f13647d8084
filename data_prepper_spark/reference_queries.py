"""The committed reference query set (FIXTURES.md §2).

Fixed, versioned — NOT generated per run. 50 queries covering: single rare
term, single hot term, hot+rare conjunctions, identifier-split forms
(camelCase queried as split words and vice versa), absent terms,
per-language keywords, punctuation-only, long multi-term, and k in
{1, 10, 100}. Rank-identity against the pure-Python oracle over this set
is the engine's golden gate (the analog of the reference's e2e golden
tests, e2e-test/log/.../EndToEndBasicLogTest.java:54-84).

Output schema both sides must produce:
(query_id int, rank int, doc_id long, score double),
ties broken by score desc then doc_id asc.
"""

from __future__ import annotations

# (query_id, query_text, k)
QUERY_SET: list[tuple[int, str, int]] = [
    (1, "parseJson buffer", 10),
    (2, "the", 10),
    (3, "the index_merge", 10),
    (4, "parse json response", 10),
    (5, "zzz_absent_term", 10),
    (6, "return", 10),
    (7, "scanChunk emitState", 100),
    (8, "INDEX_MERGE", 1),
    (9, "the int return i", 10),
    (10, "flushBatch shard term doc", 25),
    (11, "token", 10),
    (12, "tokenCount", 10),
    (13, "token count", 10),
    (14, "readBuffer writeBuffer", 10),
    (15, "hash block chunk", 10),
    (16, "def lambda yield", 10),
    (17, "public static void", 10),
    (18, "struct sizeof const", 10),
    (19, "func defer chan", 10),
    (20, "async await typeof", 10),
    (21, "example with this", 10),
    (22, "queryScore", 1),
    (23, "query score rank", 100),
    (24, "mergeSplit", 10),
    (25, "merge split", 10),
    (26, "cache flush batch shard", 10),
    (27, "x", 10),
    (28, "data get set", 10),
    (29, "new id", 10),
    (30, "state emit scan sort", 10),
    (31, "treeNode listItem", 10),
    (32, "tree node list item", 100),
    (33, "postRank docTerm", 10),
    (34, "int int int", 10),
    (35, "THE", 10),
    (36, "The Index", 10),
    (37, "absent_one absent_two", 10),
    (38, "the absent_one", 10),
    (39, "import class self", 1),
    (40, "none for in if else", 10),
    (41, "value item total count", 10),
    (42, "shardTerm", 10),
    (43, "!!!", 10),
    (44, "  ", 10),
    (45, "chunk_node_tree", 10),
    (46, "ChunkNodeTree", 10),
    (47, "write read parse", 100),
    (48, "blockMax wand", 10),
    (49, "score", 1),
    (50, "the the the the", 10),
]
