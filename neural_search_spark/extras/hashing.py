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


# ---------------------------------------------------------------------------
# affine hash family (MinHash permutations): ONE md5 per value feeds the
# whole family g_i(x) = (a_i·h(x) + b_i) mod (2^61-1) — the classic
# permutation-family construction. Seeded md5 per function costs num_hashes
# md5 evaluations per row; this costs one md5 + num_hashes multiply-adds,
# and every intermediate fits signed 64-bit EXACTLY in both engines:
# h < 2^30, a < 2^29 → a·h < 2^59; + b < 2^60 → sum < 2^61 < 2^63.
# ---------------------------------------------------------------------------
MERSENNE61 = (1 << 61) - 1
_BASE_MOD = 1 << 30


def affine_coeffs(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i): a odd 29-bit, b 60-bit — md5-derived so
    the family is reproducible in python, Spark and DuckDB."""
    import hashlib

    a = (int(hashlib.md5(f"mh-a-{i}".encode()).hexdigest()[:7], 16) << 1) | 1
    b = int(hashlib.md5(f"mh-b-{i}".encode()).hexdigest()[:15], 16)
    return a, b


def minhash_base(col: Column | str) -> Column:
    """30-bit base hash (the ONE md5 per value)."""
    return F.pmod(h60(col), F.lit(_BASE_MOD))


def minhash_affine(base: Column, i: int) -> Column:
    a, b = affine_coeffs(i)
    return F.pmod(F.lit(a) * base + F.lit(b), F.lit(MERSENNE61))


def minhash_base_sql(expr: str) -> str:
    return f"({h60_sql(expr)} % {_BASE_MOD})"


def minhash_affine_sql(base_expr: str, i: int) -> str:
    a, b = affine_coeffs(i)
    return f"(({a} * {base_expr} + {b}) % {MERSENNE61})"


def h60_unit_sql(expr: str, seed: int | str | None = None) -> str:
    return f"({h60_sql(expr, seed)} / {H60_MAX!r})"
