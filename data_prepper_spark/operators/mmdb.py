"""Minimal MaxMind DB (``.mmdb``) reader + fixture writer.

The MMDB binary format is publicly specified (MaxMind DB File Format
Specification 2.0): a binary search tree over IP bits, a data section of
tagged values, and a metadata map behind a marker. The reference's geoip
processor wraps a Java mmdb reader (geoip-processor/.../
GeoIPDatabaseReader.java); here the tree walk is a VECTORIZED numpy
loop — all rows of an Arrow batch descend the tree together, one
``take`` per bit level, so per-row Python never runs. Distinct leaf
records (a handful of countries/cities per batch) are decoded once and
joined back by pointer.

The writer emits just enough of the spec (24-bit records, disjoint
networks) to build deterministic test fixtures — there is no bundled
GeoIP database; callers bring their own file.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = 16  # bytes of zeros between tree and data section


# ---------------------------------------------------------------- decoder --
def _decode(buf: bytes, offset: int) -> tuple[Any, int]:
    """Decode one tagged value at ``offset``; returns (value, next_offset)."""
    ctrl = buf[offset]
    offset += 1
    t = ctrl >> 5
    if t == 0:  # extended type
        t = buf[offset] + 7
        offset += 1
    if t == 1:  # pointer (size bits encode pointer width, not length)
        ss = (ctrl >> 3) & 0x3
        v = ctrl & 0x7
        if ss == 0:
            ptr = (v << 8) | buf[offset]
            offset += 1
        elif ss == 1:
            ptr = ((v << 16) | int.from_bytes(buf[offset:offset + 2], "big")) + 2048
            offset += 2
        elif ss == 2:
            ptr = ((v << 24) | int.from_bytes(buf[offset:offset + 3], "big")) + 526336
            offset += 3
        else:
            ptr = int.from_bytes(buf[offset:offset + 4], "big")
            offset += 4
        value, _ = _decode(buf, ptr)
        return value, offset
    size = ctrl & 0x1F
    if size == 29:
        size = 29 + buf[offset]
        offset += 1
    elif size == 30:
        size = 285 + int.from_bytes(buf[offset:offset + 2], "big")
        offset += 2
    elif size == 31:
        size = 65821 + int.from_bytes(buf[offset:offset + 3], "big")
        offset += 3
    if t == 2:  # utf8 string
        return buf[offset:offset + size].decode("utf-8"), offset + size
    if t == 3:  # double
        return struct.unpack(">d", buf[offset:offset + 8])[0], offset + 8
    if t == 4:  # bytes
        return bytes(buf[offset:offset + size]), offset + size
    if t in (5, 6, 9, 10):  # uint16/32/64/128
        return int.from_bytes(buf[offset:offset + size], "big"), offset + size
    if t == 7:  # map
        out = {}
        for _ in range(size):
            k, offset = _decode(buf, offset)
            v, offset = _decode(buf, offset)
            out[k] = v
        return out, offset
    if t == 8:  # signed int32
        return int.from_bytes(buf[offset:offset + size], "big", signed=True), offset + size
    if t == 11:  # array
        out = []
        for _ in range(size):
            v, offset = _decode(buf, offset)
            out.append(v)
        return out, offset
    if t == 14:  # boolean (size IS the value)
        return bool(size), offset
    if t == 15:  # float
        return struct.unpack(">f", buf[offset:offset + 4])[0], offset + 4
    raise ValueError(f"unsupported mmdb type tag {t}")


class MMDBReader:
    """Memory-maps an .mmdb file; ``lookup_batch`` walks the search tree
    for a whole numpy array of IPv4 addresses at once."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        marker_at = self.buf.rfind(_METADATA_MARKER)
        if marker_at < 0:
            raise ValueError(f"{path}: no MaxMind metadata marker")
        self.meta, _ = _decode(self.buf, marker_at + len(_METADATA_MARKER))
        self.node_count = int(self.meta["node_count"])
        self.record_size = int(self.meta["record_size"])
        self.ip_version = int(self.meta.get("ip_version", 4))
        node_bytes = self.record_size * 2 // 8
        tree = np.frombuffer(
            self.buf, dtype=np.uint8, count=self.node_count * node_bytes
        ).reshape(self.node_count, node_bytes).astype(np.int64)
        if self.record_size == 24:
            self.left = (tree[:, 0] << 16) | (tree[:, 1] << 8) | tree[:, 2]
            self.right = (tree[:, 3] << 16) | (tree[:, 4] << 8) | tree[:, 5]
        elif self.record_size == 28:
            self.left = ((tree[:, 3] >> 4) << 24) | (tree[:, 0] << 16) | (tree[:, 1] << 8) | tree[:, 2]
            self.right = ((tree[:, 3] & 0xF) << 24) | (tree[:, 4] << 16) | (tree[:, 5] << 8) | tree[:, 6]
        elif self.record_size == 32:
            self.left = (tree[:, 0] << 24) | (tree[:, 1] << 16) | (tree[:, 2] << 8) | tree[:, 3]
            self.right = (tree[:, 4] << 24) | (tree[:, 5] << 16) | (tree[:, 6] << 8) | tree[:, 7]
        else:
            raise ValueError(f"unsupported record_size {self.record_size}")
        self.data_start = self.node_count * node_bytes + _DATA_SEPARATOR
        self._record_cache: dict[int, dict] = {}
        # IPv6 tree: IPv4 lives under ::/96 — pre-walk 96 zero bits once
        self.v4_root = 0
        if self.ip_version == 6:
            node = 0
            for _ in range(96):
                if node >= self.node_count:
                    break
                node = int(self.left[node])
            self.v4_root = node

    def lookup_batch(self, ips: np.ndarray) -> list[dict | None]:
        """ips: uint32/int64 array of IPv4 addresses as integers."""
        n = len(ips)
        ips = ips.astype(np.int64)
        cur = np.full(n, self.v4_root, dtype=np.int64)
        for bit in range(31, -1, -1):
            active = cur < self.node_count
            if not active.any():
                break
            b = (ips[active] >> bit) & 1
            nodes = cur[active]
            cur[active] = np.where(b == 0, self.left[nodes], self.right[nodes])
        out: list[dict | None] = [None] * n
        data_ptrs = cur - self.node_count  # == 0 -> miss; > 0 -> data
        for i in np.flatnonzero(data_ptrs > 0):
            ptr = int(data_ptrs[i])
            rec = self._record_cache.get(ptr)
            if rec is None:
                rec, _ = _decode(self.buf, self.data_start + ptr - _DATA_SEPARATOR)
                self._record_cache[ptr] = rec
            out[int(i)] = rec
        return out

    def lookup(self, ip: str | int) -> dict | None:
        if isinstance(ip, str):
            a, b, c, d = (int(x) for x in ip.split("."))
            ip = (a << 24) | (b << 16) | (c << 8) | d
        return self.lookup_batch(np.array([ip], dtype=np.int64))[0]


# ----------------------------------------------------------------- writer --
def _encode_value(v: Any) -> bytes:
    """Encode one value (string / int / float / bool / map / array)."""
    def ctrl(t: int, size: int) -> bytes:
        assert size < 29, "fixture writer supports small values only"
        return bytes([(t << 5) | size]) if t < 8 else bytes([size, t - 7])

    if isinstance(v, bool):
        return ctrl(14, int(v))
    if isinstance(v, str):
        b = v.encode("utf-8")
        return ctrl(2, len(b)) + b
    if isinstance(v, int):
        b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big") if v >= 0 else None
        if b is None:
            raise ValueError("fixture writer: unsigned ints only")
        return ctrl(6, len(b)) + b
    if isinstance(v, float):
        return ctrl(3, 8) + struct.pack(">d", v)
    if isinstance(v, dict):
        out = ctrl(7, len(v))
        for k, val in v.items():
            out += _encode_value(str(k)) + _encode_value(val)
        return out
    if isinstance(v, list):
        out = ctrl(11, len(v))
        for item in v:
            out += _encode_value(item)
        return out
    raise ValueError(f"fixture writer: unsupported type {type(v)}")


def write_mmdb(
    path: str,
    networks: list[tuple[str, dict]],
    database_type: str = "Test-GeoIP",
    build_epoch: int = 0,
) -> None:
    """Write a minimal spec-conformant IPv4 .mmdb fixture.

    ``networks`` = [("1.2.3.0/24", {"country": {...}}), ...]; networks
    must be DISJOINT (no nesting — enough for parity fixtures, spares the
    writer the spec's subtree-split rules).
    """
    # ---- build the bit trie; leaves hold a data-record index
    root: dict = {}
    records: list[bytes] = []
    rec_offsets: dict[bytes, int] = {}
    data = bytearray()
    for cidr, rec in networks:
        addr, _, plen_s = cidr.partition("/")
        plen = int(plen_s or 32)
        a, b, c, d = (int(x) for x in addr.split("."))
        ip = (a << 24) | (b << 16) | (c << 8) | d
        enc = _encode_value(rec)
        off = rec_offsets.get(enc)
        if off is None:
            off = len(data)
            rec_offsets[enc] = off
            data += enc
        node = root
        for i in range(plen):
            bit = (ip >> (31 - i)) & 1
            if i == plen - 1:
                if bit in node:
                    raise ValueError(f"overlapping network {cidr}")
                node[bit] = ("data", off)
            else:
                nxt = node.setdefault(bit, {})
                if not isinstance(nxt, dict):
                    raise ValueError(f"overlapping network {cidr}")
                node = nxt
    # ---- number interior nodes breadth-first
    order: list[dict] = []
    queue = [root]
    ids: dict[int, int] = {}
    while queue:
        n = queue.pop(0)
        ids[id(n)] = len(order)
        order.append(n)
        for bit in (0, 1):
            child = n.get(bit)
            if isinstance(child, dict):
                queue.append(child)
    node_count = len(order)

    def record_value(child) -> int:
        if child is None:
            return node_count  # no data
        if isinstance(child, dict):
            return ids[id(child)]
        return node_count + _DATA_SEPARATOR + child[1]

    tree = bytearray()
    for n in order:
        for bit in (0, 1):
            tree += record_value(n.get(bit)).to_bytes(3, "big")
    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": build_epoch,
        "database_type": database_type,
        "description": {"en": "test fixture"},
        "ip_version": 4,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 24,
    }
    with open(path, "wb") as f:
        f.write(bytes(tree))
        f.write(b"\x00" * _DATA_SEPARATOR)
        f.write(bytes(data))
        f.write(_METADATA_MARKER)
        f.write(_encode_value(meta))
