import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_spark.index.codec import (
    decode_doc_ids,
    decode_varint,
    encode_doc_ids,
    encode_varint,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63, 2**64 - 1],
                    dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)


def test_varint_empty():
    assert decode_varint(b"").size == 0
    assert encode_varint(np.array([], dtype=np.uint64)) == b""


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
def test_doc_id_roundtrip_property(xs):
    ids = np.sort(np.array(xs, dtype=np.int64))
    assert np.array_equal(decode_doc_ids(encode_doc_ids(ids)), ids)
