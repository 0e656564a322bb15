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


def test_batch_encode_parity_varint():
    import numpy as np

    from neural_search_spark.index.codec import (
        encode_varint,
        encode_varint_batch,
    )

    rng = np.random.default_rng(7)
    rows = [
        rng.integers(0, 2**62, size=n, dtype=np.int64).astype(np.uint64)
        for n in (0, 1, 1, 3, 0, 17, 1, 256, 0)
    ]
    flat = (
        np.concatenate([r for r in rows if r.size])
        if any(r.size for r in rows)
        else np.empty(0, np.uint64)
    )
    lens = np.array([r.size for r in rows])
    got = encode_varint_batch(flat, lens)
    assert got == [encode_varint(r) for r in rows]
    # all-empty batch
    assert encode_varint_batch(np.empty(0, np.uint64), np.array([0, 0])) == [
        b"", b"",
    ]


def test_batch_encode_parity_doc_ids():
    import numpy as np

    from neural_search_spark.index.codec import (
        encode_doc_ids,
        encode_doc_ids_batch,
    )

    rng = np.random.default_rng(11)
    rows = []
    for n in (1, 0, 5, 1, 40, 0, 2):
        ids = np.sort(
            rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
        )
        rows.append(ids)
    flat = (
        np.concatenate([r for r in rows if r.size])
        if any(r.size for r in rows)
        else np.empty(0, np.int64)
    )
    lens = np.array([r.size for r in rows])
    got = encode_doc_ids_batch(flat, lens)
    exp = [encode_doc_ids(r) if r.size else b"" for r in rows]
    assert got == exp
