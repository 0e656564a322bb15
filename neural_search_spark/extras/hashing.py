"""Deterministic cross-engine 60-bit hash.

Both the Spark engine and the DuckDB correctness oracle need the *same*
hash function (Spark's xxhash64 and DuckDB's hash() disagree), so every
hash-dependent operator (MinHash, SimHash, LSH buckets, fingerprints) is
built on ``h60``: the first 15 hex chars of md5 parsed as an integer
(60 bits, always < 2^63 so it fits a signed BIGINT in both engines).

Spark:  conv(substr(md5(cast(x as binary)),1,15),16,10)::long
DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT

Seeded variants hash ``x || '#' || seed`` so one string column yields an
arbitrary family of independent hash functions (MinHash permutations,
hyperplane coordinates).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

H60_MAX = float(1 << 60)


def h60(col: Column | str, seed: int | str | None = None) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def h60_sql(expr: str, seed: int | str | None = None) -> str:
    """Equivalent DuckDB SQL fragment."""
    e = expr if seed is None else f"({expr} || '#{seed}')"
    return f"(('0x' || substr(md5({e}),1,15))::BIGINT)"


def h60_unit(col: Column | str, seed: int | str | None = None) -> Column:
    """Hash mapped to [0, 1) — deterministic pseudo-random uniform."""
    return h60(col, seed) / F.lit(H60_MAX)


def h60_unit_sql(expr: str, seed: int | str | None = None) -> str:
    return f"({h60_sql(expr, seed)} / {H60_MAX!r})"
