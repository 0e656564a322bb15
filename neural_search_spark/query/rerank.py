"""Rerank processors (reference processor/rerank/*).

* rerank_by_field lives in query/hybrid.py (numeric-field rescore).
* ml_rerank here is the cross-encoder path
  (processor/rerank/MLOpenSearchRerankProcessor.java:26-80):
  inferenceSimilarity(model, query_text, [doc_texts]) → new scores →
  re-sort. The cross-encoder model is STUBBED deterministically (token
  overlap ratio — a real monotone relevance-ish signal) while the plumbing
  is real: it runs as an Arrow pandas UDF over the top-k rows ONLY
  (k ≤ pagination_depth, reference caps context at 50 fields) — never the
  corpus, exactly like the reference's fetch-phase rescore.

* track_total_hits (search/HitsThresholdChecker.java): count with an
  up-to short-circuit — `limit(n+1).count()` instead of a full count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ranking import topk_rank_window

from ..tokenizer import tokenize_py


def stub_cross_encoder(query_text: str, doc_text: str) -> float:
    """Deterministic stand-in for inferenceSimilarity: fraction of query
    terms present in the doc, weighted by term frequency saturation."""
    q = tokenize_py(query_text)
    if not q:
        return 0.0
    d = {}
    for t in tokenize_py(doc_text):
        d[t] = d.get(t, 0) + 1
    s = 0.0
    for t in set(q):
        tf = d.get(t, 0)
        s += tf / (tf + 1.0)
    return s / len(set(q))


def ml_rerank(
    topk: DataFrame,
    query_text: str,
    text_col: str = "text",
    keep_previous_score: bool = False,
) -> DataFrame:
    """Replace _score with the (stub) cross-encoder similarity and re-sort
    desc with doc_id tiebreak. Expects topk to carry doc_id + text."""

    @F.pandas_udf(T.DoubleType())
    def _sim(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: stub_cross_encoder(query_text, t or ""))

    out = topk.withColumn(
        "previous_score" if keep_previous_score else "_old",
        F.col("score"),
    ).withColumn("score", _sim(F.col(text_col)))
    if not keep_previous_score:
        out = out.drop("_old")
    w = topk_rank_window(F.desc("score"), F.asc("doc_id"))
    return out.drop("rank").orderBy(F.desc("score"), F.asc("doc_id")).withColumn(
        "rank", F.row_number().over(w).cast("int")
    )


RESCORE_SCORE_MODES = ("total", "avg", "max", "min", "multiply")


def rescore_window(
    primary: DataFrame,
    secondary: DataFrame,
    window_size: int,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
    k: int | None = None,
) -> DataFrame:
    """Generic rescore: re-score the top-``window_size`` primary hits with a
    second query and combine (the Lucene QueryRescorer the reference applies
    to hybrid results, search/query/HybridCollectorManager.java:241-268; the
    sparse two-phase processor is the specialized instance).

    primary:   (doc_id, score, ...) — first-pass scored docs.
    secondary: (doc_id, score)      — second-pass scores (only rows matching
               window docs matter; missing docs combine as "second pass did
               not match": final = qw·primary, the QueryRescorer contract).

    Hits in ``primary`` BEYOND the window keep their original score and
    order and rank strictly below the rescored block — the Lucene
    QueryRescorer.rescore contract (only the top-topN slice is re-sorted;
    the tail is left in place), so window_size < k never truncates the
    result set.

    Scale shape: the window bound is a TakeOrderedAndProject (no full sort);
    the combine join is window_size rows broadcast against the secondary
    branch, so the second query's corpus-side work is Catalyst-prunable."""
    if score_mode not in RESCORE_SCORE_MODES:
        raise ValueError(
            f"unknown rescore score_mode: {score_mode}; "
            f"valid: {RESCORE_SCORE_MODES}"
        )
    if window_size < 1:
        raise ValueError("rescore window_size must be >= 1")
    prim = primary.select("doc_id", F.col("score").alias("_first"))
    win = prim.orderBy(F.desc("_first"), F.asc("doc_id")).limit(window_size)
    sec = secondary.select("doc_id", F.col("score").alias("_second"))
    j = win.join(sec, "doc_id", "left")
    first = F.col("_first") * F.lit(query_weight)
    second = F.col("_second") * F.lit(rescore_query_weight)
    if score_mode == "total":
        combined = first + F.coalesce(second, F.lit(0.0))
    elif score_mode == "avg":
        combined = F.when(
            F.col("_second").isNull(), first
        ).otherwise((first + second) / 2.0)
    elif score_mode == "max":
        combined = F.when(
            F.col("_second").isNull(), first
        ).otherwise(F.greatest(first, second))
    elif score_mode == "min":
        combined = F.when(
            F.col("_second").isNull(), first
        ).otherwise(F.least(first, second))
    else:  # multiply
        combined = F.when(
            F.col("_second").isNull(), first
        ).otherwise(first * second)
    win_out = j.select(
        "doc_id",
        combined.cast("double").alias("score"),
        F.lit(0).alias("_blk"),
    )
    # tail: primary hits beyond the window — original score, original
    # order, strictly below the rescored block
    tail = (
        prim.join(win.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("_first").cast("double").alias("score"),
            F.lit(1).alias("_blk"),
        )
    )
    out = win_out.unionAll(tail)
    order = [F.asc("_blk"), F.desc("score"), F.asc("doc_id")]
    if k is not None:
        out = out.orderBy(*order).limit(k)
    w = topk_rank_window(*order)
    return (
        out.orderBy(*order)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .drop("_blk")
    )


def track_total_hits(matched: DataFrame, up_to: int | None = 10000) -> dict:
    """(total_hits, relation): exact count when under the threshold, else
    (up_to, 'gte') without scanning further — the reference's
    track_total_hits_up_to short-circuit as a limit-pushdown count."""
    if up_to is None:
        return {"value": matched.count(), "relation": "eq"}
    c = matched.limit(up_to + 1).count()
    if c > up_to:
        return {"value": up_to, "relation": "gte"}
    return {"value": c, "relation": "eq"}
