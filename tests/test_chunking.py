"""Chunker semantics per reference test resources (SURVEY.md §5:
processor/chunker boundary tests)."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.chunking import (
    chunk_delimiter,
    chunk_fixed_char_length,
    chunk_fixed_token_length,
    chunk_table,
)


def test_delimiter_keeps_delimiter_at_end():
    assert chunk_delimiter("a\n\nb\n\nc", "\n\n") == ["a\n\n", "b\n\n", "c"]


def test_delimiter_trailing_delimiter_no_empty_chunk():
    assert chunk_delimiter("a\n\n", "\n\n") == ["a\n\n"]


def test_delimiter_no_delimiter():
    assert chunk_delimiter("abc", "\n\n") == ["abc"]


def test_delimiter_max_chunk_limit_merges_rest():
    out = chunk_delimiter("a.b.c.d.e", ".", max_chunk_limit=3)
    # limit 3 with chunk_string_count=1: after 2 chunks the check trips
    assert out == ["a.", "b.", "c.d.e"]


def test_fixed_token_first_chunk_starts_at_zero():
    # leading punctuation is not a token but belongs to the first chunk
    out = chunk_fixed_token_length("  hello world foo bar", token_limit=2)
    assert out[0] == "  hello world "
    assert out[1] == "foo bar"


def test_fixed_token_last_chunk_runs_to_end():
    out = chunk_fixed_token_length("a b c!!!", token_limit=2)
    assert out == ["a b ", "c!!!"]


def test_fixed_token_overlap():
    text = "t0 t1 t2 t3 t4 t5"
    out = chunk_fixed_token_length(text, token_limit=4, overlap_rate=0.5)
    # step = 4 - floor(4*0.5) = 2 → windows [0:4),[2:6)
    assert out == ["t0 t1 t2 t3 ", "t2 t3 t4 t5"]


def test_fixed_token_exact_fit_single_chunk():
    assert chunk_fixed_token_length("a b c", token_limit=3) == ["a b c"]


def test_fixed_token_invalid_overlap():
    with pytest.raises(ValueError):
        chunk_fixed_token_length("a b", token_limit=2, overlap_rate=0.6)


def test_fixed_char():
    out = chunk_fixed_char_length("abcdefghij", char_limit=4)
    assert out == ["abcd", "efgh", "ij"]
    out2 = chunk_fixed_char_length("abcdefghij", char_limit=4, overlap_rate=0.5)
    # interval = 2 → 0:4, 2:6, 4:8, 6:10(end)
    assert out2 == ["abcd", "cdef", "efgh", "ghij"]


def test_max_chunk_limit_token():
    text = " ".join(f"w{i}" for i in range(20))
    out = chunk_fixed_token_length(text, token_limit=2, max_chunk_limit=5)
    assert len(out) == 5
    assert "".join(c if i == 0 else c for i, c in enumerate(out)) == text


def test_chunk_table_spark(spark):
    docs = spark.createDataFrame(
        [(1, "p1\n\np2\n\np3"), (2, None), (3, "solo")],
        "doc_id long, text string",
    )
    out = (
        chunk_table(docs, algorithm="delimiter", delimiter="\n\n")
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    got = [(r["doc_id"], r["chunk_idx"], r["chunk"]) for r in out]
    assert got == [
        (1, 0, "p1\n\n"),
        (1, 1, "p2\n\n"),
        (1, 2, "p3"),
        (3, 0, "solo"),
    ]
