"""Constant-score multi-term queries: `prefix` and `wildcard`.

Reference host behavior (OpenSearch core's PrefixQueryBuilder /
WildcardQueryBuilder, composable inside the plugin's hybrid/bool
branches): the default rewrite is CONSTANT_SCORE — Lucene builds a
bitset of every doc containing ANY matching term and scores each 1.0
(× boost), never enumerating per-term scoring clauses. That maps
cleanly onto Spark:

* index-backed: the matching terms come from the driver-side dictionary
  walk (`BM25Index.dictionary`, prefix range pushdown on the parquet
  row-group stats — for wildcards the LONGEST LITERAL PREFIX of the
  pattern prunes the read, like Lucene compiles the pattern to an
  automaton anchored on the common prefix); their postings decode to a
  distinct doc set. Small expansions stay on the driver (pyarrow);
  large ones decode in a distributed kernel.
* corpus scan: `exists(tokens, t -> predicate)` — whole-stage-codegen
  `startswith` / anchored `rlike`, no shuffle at all.

Wildcard syntax: `*` = any run (including empty), `?` = exactly one
character — translated to an anchored regex with every other character
escaped.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import tid_py
from ..tokenizer import tokenize_expr
from .bm25 import DRIVER_MAX_POSTINGS, BM25Index, _live_mask


def wildcard_regex(pattern: str) -> str:
    """Anchored regex for a Lucene wildcard pattern (* → .*, ? → .)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def wildcard_literal_prefix(pattern: str) -> str:
    """Longest literal prefix before the first wildcard — the dictionary
    range-pushdown key (empty for a leading wildcard = full dict walk)."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def expand_pattern(
    index: BM25Index, pattern, kind: str
) -> list[tuple[str, int]]:
    """Dictionary terms matching a prefix/wildcard/verbatim-set, with dfs."""
    if kind == "terms":
        stats = index.term_stats(sorted({str(v) for v in (pattern or [])}))
        return sorted(stats.items())
    if kind == "prefix":
        return index.dictionary(prefix=pattern) if pattern else []
    rx = re.compile(wildcard_regex(pattern))
    lit = wildcard_literal_prefix(pattern)
    vocab = index.dictionary(prefix=lit or None)
    return [(t, df) for t, df in vocab if rx.match(t)]


def _empty(spark) -> DataFrame:
    return spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit(0.0).cast("double").alias("score"),
        F.lit(0).cast("int").alias("rank"),
    )


def multiterm_topk(
    index: BM25Index,
    value: str,
    kind: str = "prefix",
    k: int = 10,
    boost: float = 1.0,
    mode: str = "auto",
) -> DataFrame:
    """Top-k docs containing ANY dictionary term matching the
    prefix/wildcard — constant score = boost, ties (i.e. everything)
    broken by doc_id ASC, the constant-score collector order. Returns
    (doc_id, score, rank)."""
    spark = index.spark
    exps = expand_pattern(index, value, kind)
    if not exps:
        return _empty(spark)
    terms = [t for t, _ in exps]
    sum_df = sum(df for _, df in exps)
    if mode == "driver" or (mode == "auto" and sum_df <= DRIVER_MAX_POSTINGS):
        ids = _doc_ids_driver(index, terms)
        ids = np.unique(ids)
        live = _live_mask(ids, index.deletes)
        if live is not None:
            ids = ids[live]
        ids = ids[:k]
        pdf = pd.DataFrame(
            {
                "doc_id": ids,
                "score": np.full(ids.size, float(boost)),
                "rank": np.arange(1, ids.size + 1, dtype=np.int32),
            }
        )
        return spark.createDataFrame(
            pdf, schema="doc_id long, score double, rank int"
        )
    deletes = index.deletes

    def decode_docs(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..index.codec import decode_doc_ids

        if pdf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        ids = np.unique(
            np.concatenate([decode_doc_ids(x) for x in pdf["docs"]])
        )
        live = _live_mask(ids, deletes)
        if live is not None:
            ids = ids[live]
        return pd.DataFrame({"doc_id": ids})

    blocks = index.postings_for(terms).select("shard_id", "docs")
    matched = blocks.groupBy("shard_id").applyInPandas(
        decode_docs, "doc_id long"
    )
    from ..ranking import topk_rank_window

    w = topk_rank_window(F.asc("doc_id"))
    return (
        matched.distinct()  # a doc can match several terms across shards
        .orderBy(F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            F.lit(float(boost)).alias("score"),
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )


def _doc_ids_driver(index: BM25Index, terms: list[str]) -> np.ndarray:
    """Driver pyarrow read of just the docs column for the given terms."""
    import pyarrow.dataset as ds

    from ..index.build import N_TERM_BUCKETS
    from ..index.codec import decode_doc_ids

    tids = sorted({tid_py(t) for t in terms})
    buckets = sorted({t % N_TERM_BUCKETS for t in tids})
    if index._postings_ds is None:
        index._postings_ds = ds.dataset(
            index._postings_path, format="parquet", partitioning="hive"
        )
    tbl = index._postings_ds.to_table(
        columns=["docs"],
        filter=ds.field("term_bucket").isin(buckets)
        & ds.field("tid").isin(tids),
    )
    parts = [decode_doc_ids(x) for x in tbl["docs"].to_pylist()]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def term_topk(
    index: BM25Index, value: str, k: int = 10, mode: str = "auto"
) -> DataFrame:
    """Un-analyzed `term` query (Lucene TermQuery, BM25-scored): the
    VERBATIM value is looked up in the dictionary — no tokenization or
    lowercasing, so a value the analyzer would have rewritten simply
    misses, exactly like a raw TermQuery against an analyzed field.
    Returns (doc_id, score, rank) via the standard BM25 kernels."""
    from .bm25 import lucene_idf, weighted_term_topk

    stats = index.term_stats([value]) if value else {}
    if value not in stats:
        return index.spark.range(0).select(
            F.col("id").alias("doc_id"),
            F.lit(0.0).cast("float").alias("score"),
            F.lit(0).cast("int").alias("rank"),
        )
    w = {value: lucene_idf(index.n_docs, stats[value])}
    return weighted_term_topk(index, w, k=k, mode=mode)


def term_scored_scan(
    docs: DataFrame,
    value: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-free `term` scorer → (doc_id, score double), scoped-frame
    stats like every other scan (one tokenize pass, one doc-keyed agg)."""
    from .. import BM25_B, BM25_K1

    spark = docs.sparkSession
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
    )
    if not value:
        return empty
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_expr(text_col).alias("toks"),
    ).withColumn("dl", F.size("toks"))
    srow = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(srow["n"]), float(srow["avgdl"] or 1.0)
    tf = toks.select(
        "doc_id",
        "dl",
        F.size(F.filter("toks", lambda t: t == value)).alias("tf"),
    ).filter(F.col("tf") > 0)
    dfrow = tf.agg(F.count(F.lit(1)).alias("df")).collect()[0]
    df = int(dfrow["df"])
    if df == 0:
        return empty
    from .bm25 import lucene_idf

    idf = lucene_idf(n_docs, df)
    return tf.select(
        "doc_id",
        (
            F.lit(idf)
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))
            )
        ).alias("score"),
    )


def multiterm_scored_scan(
    docs: DataFrame,
    value: str,
    kind: str = "prefix",
    boost: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-free constant-score scan → (doc_id, score double): a pure
    map-side `exists` over the token array — no shuffle, no stats."""
    empty_scan = docs.sparkSession.range(0).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
    )
    if kind == "terms":
        vals = sorted({str(v) for v in (value or [])})
        if not vals:
            return empty_scan
        pred = lambda t: t.isin(vals)  # noqa: E731
    elif kind == "prefix":
        if not value:
            return empty_scan
        pred = lambda t: t.startswith(value)  # noqa: E731
    else:
        rx = wildcard_regex(value)
        pred = lambda t: t.rlike(rx)  # noqa: E731
    return docs.filter(
        F.exists(tokenize_expr(text_col), pred)
    ).select(
        F.col(id_col).alias("doc_id"), F.lit(float(boost)).alias("score")
    )
