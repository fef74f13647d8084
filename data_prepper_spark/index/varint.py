"""Vectorized LEB128 varint + delta-gap codec for posting blocks.

Numpy-vectorized in both directions — encode/decode never loop per value in
Python (a few fixed-size passes over byte positions only), so decoding stays
fast inside the Arrow-batched WAND kernel.

Layout per block (see index/build.py): doc_ids are stored as
``first_doc_id`` (int64 column) plus varint deltas of the *remaining*
doc_ids; tfs and dls are plain varints. doc_ids within a block are strictly
increasing, so every delta is >= 1.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def _encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array; returns (byte array, per-value byte
    lengths). Vectorized: loops only over the max byte width (<=10)."""
    v = values.astype(np.uint64, copy=True)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1
    offsets = np.concatenate(([0], np.cumsum(nbits)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    maxb = int(nbits.max())
    for b in range(maxb):
        sel = nbits > b
        byte = ((v[sel] >> np.uint64(7 * b)) & _MASK7).astype(np.uint8)
        last = nbits[sel] == b + 1
        byte[~last] |= _CONT
        out[offsets[:-1][sel] + b] = byte
    return out, nbits


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    out, _ = _encode_with_lengths(values)
    return out.tobytes()


def encode_varints_segmented(values: np.ndarray, seg_lengths: np.ndarray) -> list[bytes]:
    """Encode ``values`` once, then split the buffer into one ``bytes`` per
    segment of ``seg_lengths`` consecutive values (sum == len(values)).

    This is the whole-partition fast path of the block builder: a single
    vectorized encode for *all* blocks of a shard, then O(n_blocks) cheap
    buffer slices — no per-block numpy round-trips.
    """
    out, nbits = _encode_with_lengths(values)
    buf = out.tobytes()
    byte_bounds = np.concatenate(([0], np.cumsum(nbits)))
    seg_bounds = np.concatenate(([0], np.cumsum(seg_lengths)))
    starts = byte_bounds[seg_bounds[:-1]]
    ends = byte_bounds[seg_bounds[1:]]
    return [buf[int(s) : int(e)] for s, e in zip(starts, ends)]


def decode_varints(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints into a uint64 array (vectorized)."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & _CONT) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    pos_in_value = np.arange(raw.size) - np.repeat(starts, ends - starts + 1)
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos_in_value.astype(np.uint64))
    # segmented sum: cumsum then difference at segment ends
    cs = np.cumsum(contrib, dtype=np.uint64)
    seg_end = cs[ends]
    out = np.empty(count, dtype=np.uint64)
    out[0] = seg_end[0]
    out[1:] = seg_end[1:] - cs[ends[:-1]]
    return out


def encode_doc_ids(doc_ids: np.ndarray) -> tuple[int, bytes]:
    """Strictly-increasing int64 doc_ids -> (first_doc_id, varint gaps)."""
    d = doc_ids.astype(np.int64)
    first = int(d[0])
    gaps = (d[1:].astype(np.uint64) - d[:-1].astype(np.uint64))  # >=1, wraps safe
    return first, encode_varints(gaps)


def decode_doc_ids(first: int, gaps_buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(first % (1 << 64))
    if n > 1:
        gaps = decode_varints(gaps_buf, n - 1)
        out[1:] = np.cumsum(gaps, dtype=np.uint64) + out[0]
    return out.astype(np.int64)
