"""Text chunking processors (ingest side).

Reference: processor/TextChunkingProcessor.java:49-311 with three algorithms
(processor/chunker/FixedTokenLengthChunker.java:133-170,
DelimiterChunker.java:60-86, FixedCharLengthChunker.java:90-125). Exact
offset semantics replicated:

* fixed_token_length: tokenize with the engine's frozen tokenizer (offsets on
  the original string; lowercasing preserves positions), emit windows of
  ``token_limit`` tokens stepping by token_limit - floor(token_limit *
  overlap_rate). First chunk starts at char 0; a chunk that ends before the
  last token ends at the NEXT window's first-token start offset (gap chars
  included); the final chunk runs to end-of-string.
* delimiter: split on the literal delimiter, delimiter kept at the END of
  each chunk; trailing content (if any) is the last chunk; no empty trailing
  chunk when content ends with the delimiter.
* fixed_char_length: windows of ``char_limit`` chars stepping by
  char_limit - floor(char_limit * overlap_rate); final chunk to end.

All honor ``max_chunk_limit`` (default 100, -1 disables,
Chunker.java:23,54-56): when the limit would be exceeded, the remainder of
the string becomes one final chunk.

Spark surface: ``chunk_udf`` returns ArrayType(String) (Arrow-batched); use
``posexplode`` for a (doc_id, chunk_idx, chunk) table. Chunking is an
ingest-side transform — the per-string Python here is wrapped in an Arrow
pandas UDF so batches move columnar; the string slicing itself is C-speed.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tokenizer import TOKEN_RE

DEFAULT_MAX_CHUNK_LIMIT = 100  # Chunker.java:23
DISABLED_MAX_CHUNK_LIMIT = -1
DEFAULT_TOKEN_LIMIT = 384  # FixedTokenLengthChunker
DEFAULT_CHAR_LIMIT = 2048  # FixedCharLengthChunker
DEFAULT_DELIMITER = "\n\n"


def _limit_hit(n_chunks: int, max_chunk_limit: int, chunk_string_count: int = 1) -> bool:
    return (
        max_chunk_limit != DISABLED_MAX_CHUNK_LIMIT
        and n_chunks + chunk_string_count >= max_chunk_limit
    )


def chunk_fixed_token_length(
    content: str,
    token_limit: int = DEFAULT_TOKEN_LIMIT,
    overlap_rate: float = 0.0,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("Parameter [overlap_rate] must be between 0 and 0.5")
    if token_limit <= 0:
        raise ValueError("Parameter [token_limit] must be positive")
    if content is None:
        return []
    starts = [m.start() for m in TOKEN_RE.finditer(content.lower())]
    chunks: list[str] = []
    overlap_tokens = int(math.floor(token_limit * overlap_rate))
    i = 0
    while i < len(starts):
        start_pos = 0 if i == 0 else starts[i]
        if _limit_hit(len(chunks), max_chunk_limit):
            chunks.append(content[start_pos:])
            break
        if i + token_limit >= len(starts):
            chunks.append(content[start_pos:])
            break
        chunks.append(content[start_pos : starts[i + token_limit]])
        i += token_limit - overlap_tokens
    return chunks


def chunk_delimiter(
    content: str,
    delimiter: str = DEFAULT_DELIMITER,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if content is None:
        return []
    chunks: list[str] = []
    start = 0
    nxt = content.find(delimiter)
    while nxt != -1:
        if _limit_hit(len(chunks), max_chunk_limit):
            break
        end = nxt + len(delimiter)
        chunks.append(content[start:end])
        start = end
        nxt = content.find(delimiter, start)
    if start < len(content):
        chunks.append(content[start:])
    return chunks


def chunk_fixed_char_length(
    content: str,
    char_limit: int = DEFAULT_CHAR_LIMIT,
    overlap_rate: float = 0.0,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("Parameter [overlap_rate] must be between 0 and 0.5")
    if char_limit <= 0:
        raise ValueError("Parameter [char_limit] must be positive")
    if content is None:
        return []
    chunks: list[str] = []
    overlap_chars = int(math.floor(char_limit * overlap_rate))
    interval = char_limit - overlap_chars
    i = 0
    while i < len(content):
        if _limit_hit(len(chunks), max_chunk_limit):
            chunks.append(content[i:])
            break
        if i + char_limit >= len(content):
            chunks.append(content[i:])
            break
        chunks.append(content[i : i + char_limit])
        i += interval
    return chunks


_ALGORITHMS = {
    "fixed_token_length": chunk_fixed_token_length,
    "delimiter": chunk_delimiter,
    "fixed_char_length": chunk_fixed_char_length,
}


def chunk_udf(algorithm: str = "fixed_token_length", **params) -> Column:
    """Factory: a pandas UDF column expression chunking a string column."""
    if algorithm not in _ALGORITHMS:
        raise ValueError(
            f"unknown chunking algorithm: {algorithm}; valid: {sorted(_ALGORITHMS)}"
        )
    fn = _ALGORITHMS[algorithm]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: fn(s, **params) if s is not None else [])

    return _chunk


def chunk_table(
    docs,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    algorithm: str = "fixed_token_length",
    **params,
):
    """(ids..., chunk_idx, chunk) — posexplode of the chunker output."""
    udf = chunk_udf(algorithm, **params)
    return docs.select(
        *id_cols, F.posexplode(udf(F.col(text_col))).alias("chunk_idx", "chunk")
    )
