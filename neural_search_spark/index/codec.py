"""Vectorized delta + LEB128-varint codec for posting blocks (numpy only).

Posting blocks store sorted doc_ids as zigzag-free unsigned deltas (doc_ids
are mapped int64 → uint64 order-preservingly by adding 2^63, so deltas of the
sorted sequence are non-negative) and term frequencies as plain varints.
Encode/decode are fully vectorized — no per-value Python loops, only a loop
over the ≤10 varint byte positions.

This plays the role Lucene's block postings format plays for the reference
(consumed there via org.apache.lucene Scorer iterators, e.g. reference
query/HybridQueryScorer.java:33-89); built here from scratch for Spark.
"""

from __future__ import annotations

import numpy as np

_SIGN_FLIP = np.uint64(1) << np.uint64(63)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nbytes = np.ones(v.shape, dtype=np.int64)
    for i in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * i))).astype(np.int64)
    offsets = np.cumsum(nbytes) - nbytes
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for i in range(10):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > i
        out[offsets[mask] + i] = chunk.astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    n_vals = int(ends.sum())
    # index of the value each byte belongs to
    val_id = np.zeros(b.size, dtype=np.int64)
    val_id[1:] = np.cumsum(ends)[:-1]
    # position of each byte within its value
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    counts = np.diff(np.concatenate((starts, [b.size])))
    byte_pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, counts)
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(
        vals,
        val_id,
        (b & np.uint8(0x7F)).astype(np.uint64) << (7 * byte_pos).astype(np.uint64),
    )
    return vals


def encode_varint_batch(
    values: np.ndarray, row_lengths: np.ndarray
) -> list[bytes]:
    """LEB128-encode MANY rows in one vectorized pass: `values` is the
    row-concatenated uint64 array, `row_lengths` the per-row value
    counts. Returns one bytes object per row, byte-identical to calling
    ``encode_varint`` per row — but the 10-iteration encode runs ONCE
    over the whole batch, so a million one-posting blocks cost one numpy
    pass + a million buffer slices instead of a million full encodes
    (the high-vocabulary-field build path, e.g. shingle subfields)."""
    row_lengths = np.asarray(row_lengths, dtype=np.int64)
    n_rows = len(row_lengths)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * n_rows
    nbytes = np.ones(v.shape, dtype=np.int64)
    for i in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * i))).astype(np.int64)
    offsets = np.cumsum(nbytes) - nbytes
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for i in range(10):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > i
        out[offsets[mask] + i] = chunk.astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
    buf = out.tobytes()
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    ends_v = np.cumsum(row_lengths)
    starts_v = ends_v - row_lengths
    bs = cum[starts_v]
    be = cum[ends_v]
    return [buf[s:e] for s, e in zip(bs.tolist(), be.tolist())]


def encode_doc_ids_batch(
    flat_sorted_ids: np.ndarray, row_lengths: np.ndarray
) -> list[bytes]:
    """Batched ``encode_doc_ids``: per-row delta encoding computed
    globally (each row's first value stays absolute), then one batched
    varint pass. Byte-identical to the per-row form."""
    row_lengths = np.asarray(row_lengths, dtype=np.int64)
    u = (
        np.ascontiguousarray(flat_sorted_ids, dtype=np.int64).astype(
            np.uint64
        )
        + _SIGN_FLIP
    )
    if u.size == 0:
        return [b""] * len(row_lengths)
    d = np.empty_like(u)
    d[0] = u[0]
    d[1:] = u[1:] - u[:-1]
    starts = np.cumsum(row_lengths) - row_lengths
    starts = starts[row_lengths > 0]  # empty rows have no first value
    d[starts] = u[starts]
    return encode_varint_batch(d, row_lengths)


def encode_doc_ids(sorted_doc_ids: np.ndarray) -> bytes:
    """Delta + varint encode an ascending int64 doc_id array."""
    u = sorted_doc_ids.astype(np.int64).astype(np.uint64) + _SIGN_FLIP
    deltas = np.empty_like(u)
    deltas[0:1] = u[0:1]
    deltas[1:] = u[1:] - u[:-1]
    return encode_varint(deltas)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = decode_varint(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    u = np.cumsum(deltas, dtype=np.uint64)
    return (u - _SIGN_FLIP).astype(np.int64)


def encode_f32(vals: np.ndarray) -> bytes:
    """Raw little-endian float32 payload (sparse feature weights — the
    FeatureField analog stores one float per posting, not an int tf)."""
    return np.ascontiguousarray(vals, dtype="<f4").tobytes()


def decode_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4")


def encode_tfs(tfs: np.ndarray) -> bytes:
    return encode_varint(tfs.astype(np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varint(buf).astype(np.int64)
