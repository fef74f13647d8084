"""Varint / delta-gap codec round-trip properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_prepper_spark.index.varint import (
    decode_doc_ids,
    decode_varints,
    encode_doc_ids,
    encode_varints,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=400))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varints(encode_varints(arr), len(arr)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
def test_doc_id_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.int64)
    first, gaps = encode_doc_ids(arr)
    assert decode_doc_ids(first, gaps, len(arr)).tolist() == ids


def test_empty_and_zero():
    assert encode_varints(np.zeros(0, dtype=np.uint64)) == b""
    assert decode_varints(b"", 0).tolist() == []
    assert decode_varints(encode_varints(np.array([0], dtype=np.uint64)), 1).tolist() == [0]


def test_payload_roundtrip_both_codecs():
    import numpy as np

    from data_prepper_spark.index.varint import (
        decode_doc_ids_payload,
        decode_payload,
        encode_payload_segmented,
    )

    rng = np.random.RandomState(3)
    segs = [
        rng.randint(0, 2**50, 128).astype(np.uint64),   # realistic doc gaps
        np.zeros(5, dtype=np.uint64),                    # all-zero
        rng.randint(0, 2**62, 7).astype(np.uint64),      # >57 bits -> varint fallback
        np.array([], dtype=np.uint64),                   # empty
        np.array([1], dtype=np.uint64),                  # single
        rng.randint(0, 100, 128).astype(np.uint64),      # tf-sized
    ]
    vals = np.concatenate(segs)
    lens = np.array([len(s) for s in segs])
    for codec in ("varint", "bitpack"):
        bufs = encode_payload_segmented(vals, lens, codec)
        for s, b in zip(segs, bufs):
            assert decode_payload(b, len(s)).tolist() == s.tolist()
    ids = np.unique(np.sort(rng.randint(-(2**62), 2**62, 100).astype(np.int64)))
    gaps = ids[1:].astype(np.uint64) - ids[:-1].astype(np.uint64)
    for codec in ("varint", "bitpack"):
        buf = encode_payload_segmented(gaps, np.array([len(gaps)]), codec)[0]
        assert decode_doc_ids_payload(int(ids[0]), buf, len(ids)).tolist() == ids.tolist()


def test_bitpack_smaller_on_wide_gaps():
    import numpy as np

    from data_prepper_spark.index.varint import encode_payload_segmented

    g = np.random.RandomState(5).randint(2**44, 2**50, 127).astype(np.uint64)
    v = encode_payload_segmented(g, np.array([127]), "varint")[0]
    b = encode_payload_segmented(g, np.array([127]), "bitpack")[0]
    assert len(b) < len(v) * 0.9  # >=10% smaller on hash-spread gaps


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=0, max_size=150),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from(["varint", "bitpack"]),
)
def test_payload_segmented_property(seg_lists, codec):
    from data_prepper_spark.index.varint import decode_payload, encode_payload_segmented

    vals = np.array([v for seg in seg_lists for v in seg], dtype=np.uint64)
    lens = np.array([len(seg) for seg in seg_lists], dtype=np.int64)
    bufs = encode_payload_segmented(vals, lens, codec)
    assert len(bufs) == len(seg_lists)
    for seg, buf in zip(seg_lists, bufs):
        assert decode_payload(buf, len(seg)).tolist() == seg
