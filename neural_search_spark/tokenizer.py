"""Frozen tokenizer shared by the engine, the numpy oracle, and the SQL oracle.

Semantics (documented contract — the "analyzer" of this engine, playing the
role the Lucene ``standard``-ish analyzers play for the reference's chunkers,
cf. reference processor/chunker/FixedTokenLengthChunker.java word tokenizers):

    lowercase(text) → all maximal runs of [a-z0-9] → list<string>

This is expressible three equivalent ways, all tested for parity:
  * pandas UDF (Arrow-vectorized, the hot index-build path per the
    no-per-row-Python constraint),
  * pure Catalyst (``split`` + ``filter``) for plans that want to stay
    entirely JVM-side,
  * ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_py(text: str) -> list[str]:
    """Single-string tokenizer (oracle / unit tests)."""
    if text is None:
        return []
    return TOKEN_RE.findall(text.lower())


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer: one regex pass per batch, no per-row Python
    interpreter dispatch beyond pandas' optimized str accessor."""
    return texts.fillna("").str.lower().str.findall(TOKEN_RE)


def tokenize_expr(col: Column | str) -> Column:
    """Pure-Catalyst tokenizer, identical output to ``tokenize_udf``.

    Stays inside whole-stage codegen — used where the plan benefits from
    JVM-side execution (e.g. oracle-parity queries).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(F.lower(c), "[^a-z0-9]+")
    return F.filter(parts, lambda x: x != F.lit(""))


def tokenize_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same token array."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
