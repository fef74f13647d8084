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
