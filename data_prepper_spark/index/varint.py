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


# ---------------------------------------------------------------------------
# Tagged payload layer: self-describing block buffers.
#
# Every buffer begins with a 1-byte codec tag, so blocks written with
# different codecs (or different builds of the same index after an
# incremental refresh with a new default) coexist and decode correctly:
#
#   0x00  LEB128 varint stream (the raw codec above)
#   0x01  FastLanes-style fixed-width bit-packing: [w:1][packed, 7B pad]
#
# Bit-packing (VLDB'23 FastLanes layout idea, scalar rendition): a block's
# values are packed at the block's max bit width w. doc-id gaps in this
# engine are xxhash64-spread (~45-55 bits for realistic shard densities),
# where varint spends 7-8 bytes/value but packing spends w/8 — a ~20-25%
# smaller posting payload and a branch-free vectorized decode (one 8-byte
# gather + shift + mask per value). Widths > 57 (shift+w would overflow a
# uint64 lane) and empty segments fall back to the varint tag per buffer.
# ---------------------------------------------------------------------------

CODEC_VARINT = 0
CODEC_BITPACK = 1
_BP_MAX_W = 57


def _bitlen_max_per_segment(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    if values.size == 0:
        return np.zeros(len(seg_starts), dtype=np.int64)
    seg_max = np.maximum.reduceat(values, seg_starts)
    w = np.zeros(len(seg_starts), dtype=np.int64)
    tmp = seg_max.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        w[nz] += 1
        tmp >>= np.uint64(1)
    return w


def encode_bitpacked(values: np.ndarray) -> bytes:
    """[tag 0x01][w:1][ceil(n*w/8) packed bytes + 7 pad]. Caller must have
    checked max bit width <= 57."""
    v = values.astype(np.uint64, copy=False)
    n = v.size
    if n == 0:
        return bytes([CODEC_BITPACK, 0])
    w = int(_bitlen_max_per_segment(v, np.array([0]))[0])
    if w == 0:
        return bytes([CODEC_BITPACK, 0])
    nbytes = (n * w + 7) // 8 + 7  # +7: OR-scatter writes 8-byte lanes
    out = np.zeros(nbytes, dtype=np.uint8)
    bit_off = np.arange(n, dtype=np.int64) * w
    byte_off = bit_off >> 3
    shift = (bit_off & 7).astype(np.uint64)
    shifted = v << shift
    for k in range(8):
        np.bitwise_or.at(out, byte_off + k, ((shifted >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8))
    return bytes([CODEC_BITPACK, w]) + out.tobytes()


def _decode_bitpacked(buf: bytes, count: int) -> np.ndarray:
    w = buf[1]
    if count == 0 or w == 0:
        return np.zeros(count, dtype=np.uint64)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=2)
    payload = np.concatenate((payload, np.zeros(8, dtype=np.uint8)))
    bit_off = np.arange(count, dtype=np.int64) * w
    byte_off = bit_off >> 3
    gather = payload[byte_off[:, None] + np.arange(8)]
    lanes = np.bitwise_or.reduce(
        gather.astype(np.uint64) << (np.uint64(8) * np.arange(8, dtype=np.uint64)), axis=1
    )
    mask = (np.uint64(1) << np.uint64(w)) - np.uint64(1) if w < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return (lanes >> (bit_off.astype(np.uint64) & np.uint64(7))) & mask


def encode_payload_segmented(
    values: np.ndarray, seg_lengths: np.ndarray, codec: str = "varint"
) -> list[bytes]:
    """Tagged per-segment buffers. 'varint' prefixes the raw streams;
    'bitpack' packs each segment at its own max width (vectorized by
    grouping segments of equal width), falling back to varint for
    segments wider than 57 bits."""
    if codec == "varint":
        return [bytes([CODEC_VARINT]) + b for b in encode_varints_segmented(values, seg_lengths)]
    assert codec == "bitpack", codec
    seg_lengths = np.asarray(seg_lengths, dtype=np.int64)
    v = values.astype(np.uint64, copy=False)
    seg_bounds = np.concatenate(([0], np.cumsum(seg_lengths)))
    out: list[bytes | None] = [None] * len(seg_lengths)
    # varint fallback for over-wide segments, computed in one batch
    widths = np.zeros(len(seg_lengths), dtype=np.int64)
    nonempty = seg_lengths > 0
    if nonempty.any():
        widths[nonempty] = _bitlen_max_per_segment(v, seg_bounds[:-1][nonempty])
    wide = widths > _BP_MAX_W
    if wide.any():
        mask_vals = np.concatenate(
            [v[seg_bounds[i] : seg_bounds[i + 1]] for i in np.flatnonzero(wide)]
        )
        for i, b in zip(
            np.flatnonzero(wide),
            encode_varints_segmented(mask_vals, seg_lengths[wide]),
        ):
            out[int(i)] = bytes([CODEC_VARINT]) + b
    for i in np.flatnonzero(~wide):
        out[int(i)] = encode_bitpacked(v[seg_bounds[i] : seg_bounds[i + 1]])
    return out  # type: ignore[return-value]


def decode_payload(buf: bytes, count: int) -> np.ndarray:
    """Decode a tagged buffer into uint64 values."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    tag = buf[0]
    if tag == CODEC_VARINT:
        return decode_varints(buf[1:], count)
    if tag == CODEC_BITPACK:
        return _decode_bitpacked(buf, count)
    raise ValueError(f"unknown payload codec tag {tag}")


def decode_doc_ids_payload(first: int, gaps_buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(first % (1 << 64))
    if n > 1:
        out[1:] = np.cumsum(decode_payload(gaps_buf, n - 1), dtype=np.uint64) + out[0]
    return out.astype(np.int64)
