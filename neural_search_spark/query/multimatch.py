"""Index-backed multi_match: per-field BM25 over per-field block indexes.

Reference semantics (the OpenSearch host behavior the reference's hybrid
branches compose with, same contract as the corpus twin
``query/neural.multi_match_scored``): statistics live per field — each
field is its own inverted index with its own n_docs / avgdl / df, exactly
like a Lucene segment's per-field terms dictionary — each field scores the
query as its own BM25 match, the ``name^boost`` boost multiplies that
field's score, and the per-doc combine is

* ``best_fields`` — DisjunctionMaxQuery: ``max + tie_breaker · (sum − max)``;
* ``most_fields`` — bool-should sum.

This module serves those scores from ATTACHED per-field indexes without
touching the corpus, closing the one query type that previously always
corpus-scanned even with indexes available.

Execution strategy (100-TB notes):

* **driver mode** (auto when the query's total Σdf across fields is under
  ``DRIVER_MAX_POSTINGS``): every field's full matched set decodes through
  that index's bounded driver cache (the coordinator cheap-query pattern
  shared with ``bm25_topk``), and the combine is one numpy pass — zero
  Spark jobs on the hot serving path.
* **distributed, best_fields with tie_breaker == 0** (the OpenSearch
  default): per-field MaxScore-pruned ``bm25_topk`` → union → one doc-keyed
  max. EXACT by containment: if doc d is in the global dis-max top-k, then
  in the field f achieving d's max there cannot be k docs with a higher
  f-score (each would out-rank d globally), so d is inside f's own top-k
  list and its max survives the union. A positive boost rescales a field's
  scores monotonically, so per-field pruning order is unchanged. No full
  postings decode anywhere — the Spark analog of running block-max WAND
  under a DisjunctionMaxQuery.
* **distributed, general** (``most_fields`` or ``tie_breaker > 0``): the
  combined score needs every candidate's OTHER-field scores, which
  truncated per-field lists cannot provide. Decode each field's postings
  for the query terms only (bounded by Σdf — the bytes any disjunctive
  scorer reads), partially aggregate per doc INSIDE each mapInPandas task
  (map-side combine), then ONE doc_id shuffle where each field lands as a
  conditional sum — a single exchange regardless of the field count.

Deletes: each field index's tombstone set masks during decode (Lucene
liveDocs), same contract as ``bm25_topk``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import tid_py
from ..tokenizer import tokenize_py
from .bm25 import (
    DRIVER_MAX_POSTINGS,
    BM25Index,
    _driver_scored_all,
    _live_mask,
    bm25_topk,
    lucene_idf,
)
from ..index.codec import decode_doc_ids, decode_varint


def parse_field_boosts(fields: list[str]) -> list[tuple[str, float]]:
    """Split the host's ``"name^2.5"`` field syntax into (name, boost)."""
    out = []
    for f in fields:
        name, _, boost = f.partition("^")
        out.append((name, float(boost) if boost else 1.0))
    return out


def _field_plan(index: BM25Index, query_text: str):
    """Per-field query resolution: in-vocabulary terms, their idfs (this
    field's own statistics), and the field's Σdf cost bound."""
    clauses = sorted(set(tokenize_py(query_text)))
    stats = index.term_stats(clauses)
    terms = [t for t in clauses if t in stats]
    idfs = {tid_py(t): lucene_idf(index.n_docs, stats[t]) for t in terms}
    return terms, idfs, sum(stats[t] for t in terms)


def _scored_partial_index(
    index: BM25Index, terms: list[str], idfs: dict[int, float], boost: float
) -> DataFrame:
    """Full matched set of one field, partially aggregated per task:
    (doc_id, score·boost) with NO shuffle — a doc may appear once per
    posting partition; the caller's single doc_id aggregation finishes the
    sum. Work is bounded by this field's Σdf."""
    k1, b, avgdl = index.k1, index.b, index.avgdl
    deletes = index.deletes

    def decode_part(it):
        for pdf in it:
            if pdf.empty:
                continue
            ids_parts, sc_parts = [], []
            for t, g in pdf.groupby("tid", sort=False):
                ids = np.concatenate([decode_doc_ids(x) for x in g["docs"]])
                tfs = np.concatenate(
                    [decode_varint(x) for x in g["tfs"]]
                ).astype(np.float64)
                dls = np.concatenate(
                    [decode_varint(x) for x in g["dls"]]
                ).astype(np.float64)
                live = _live_mask(ids, deletes)
                if live is not None:
                    ids, tfs, dls = ids[live], tfs[live], dls[live]
                ids_parts.append(ids)
                sc_parts.append(
                    idfs[t] * tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
                )
            if not ids_parts:
                continue
            all_ids = np.concatenate(ids_parts)
            acc_ids, inv = np.unique(all_ids, return_inverse=True)
            acc_sc = np.bincount(
                inv,
                weights=np.concatenate(sc_parts),
                minlength=len(acc_ids),
            )
            yield pd.DataFrame(
                {"doc_id": acc_ids, "score": acc_sc * boost}
            )

    return index.postings_for(terms).select(
        "tid", "docs", "tfs", "dls"
    ).mapInPandas(decode_part, "doc_id long, score double")


def _combine_np(
    parts: list[tuple[np.ndarray, np.ndarray]],
    match_type: str,
    tie_breaker: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver combine: per-field (ids, boosted scores) → (ids, combined)."""
    all_ids = np.concatenate([p[0] for p in parts])
    all_sc = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    sm = np.bincount(inv, weights=all_sc, minlength=len(uniq))
    if match_type == "most_fields":
        return uniq, sm
    mx = np.full(len(uniq), -np.inf)
    np.maximum.at(mx, inv, all_sc)
    return uniq, mx + tie_breaker * (sm - mx)


def multi_match_index_topk(
    field_indexes: dict[str, BM25Index],
    query_text: str,
    fields: list[str],
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    mode: str = "auto",
) -> DataFrame:
    """multi_match served from per-field block indexes →
    (doc_id, score, rank), rank-ordered score desc / doc_id asc like every
    index kernel (float32 final cast, so ties match the other paths).

    mode: 'auto' (driver numpy combine when the total Σdf across all
    fields is under DRIVER_MAX_POSTINGS), 'driver', or 'distributed'."""
    if match_type not in ("best_fields", "most_fields"):
        raise ValueError(
            f"multi_match type must be best_fields|most_fields, got "
            f"{match_type!r}"
        )
    if not fields:
        raise ValueError("multi_match needs at least one field")
    plan = []
    spark = None
    for name, boost in parse_field_boosts(fields):
        if name not in field_indexes:
            raise KeyError(
                f"multi_match field {name!r} has no attached index "
                f"(have: {sorted(field_indexes)})"
            )
        index = field_indexes[name]
        spark = index.spark
        terms, idfs, sdf = _field_plan(index, query_text)
        if terms:
            plan.append((index, boost, terms, idfs, sdf))

    def _empty() -> DataFrame:
        return spark.range(0).select(
            F.col("id").alias("doc_id"),
            F.lit(0.0).cast("float").alias("score"),
            F.lit(0).cast("int").alias("rank"),
        )

    if not plan:
        return _empty()
    total_sdf = sum(p[4] for p in plan)
    driver = mode == "driver" or (
        mode == "auto" and total_sdf < DRIVER_MAX_POSTINGS
    )

    if driver:
        parts = []
        for index, boost, terms, idfs, _ in plan:
            ids, sc, _n = _driver_scored_all(
                index, idfs, [tid_py(t) for t in terms]
            )
            if len(ids):
                parts.append((ids, sc * boost))
        if not parts:
            return _empty()
        uniq, combined = _combine_np(parts, match_type, tie_breaker)
        f32 = combined.astype(np.float32)
        sel = np.lexsort((uniq, -f32.astype(np.float64)))[:k]
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": uniq[sel],
                    "score": f32[sel],
                    "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
                }
            ),
            schema="doc_id long, score float, rank int",
        )

    if match_type == "best_fields" and tie_breaker == 0.0:
        # pruned route (exactness argument in the module docstring): each
        # field's own MaxScore top-k, one doc-keyed max over the union
        tall = None
        for index, boost, _terms, _idfs, _ in plan:
            part = bm25_topk(index, query_text, k=k, mode=mode).select(
                "doc_id",
                (F.col("score").cast("double") * F.lit(boost)).alias(
                    "score"
                ),
            )
            tall = part if tall is None else tall.unionAll(part)
        combined = tall.groupBy("doc_id").agg(
            F.max("score").alias("score")
        )
    else:
        # general route: full per-field matched sets, map-side partial
        # per-doc sums, ONE doc_id exchange carrying every field as a
        # conditional aggregate
        tall = None
        for fid, (index, boost, terms, idfs, _) in enumerate(plan):
            part = _scored_partial_index(index, terms, idfs, boost).select(
                "doc_id", "score", F.lit(fid).alias("fid")
            )
            tall = part if tall is None else tall.unionAll(part)
        per_field = [
            F.sum(F.when(F.col("fid") == i, F.col("score"))).alias(f"s{i}")
            for i in range(len(plan))
        ]
        wide = tall.groupBy("doc_id").agg(*per_field)
        cols = [F.col(f"s{i}") for i in range(len(plan))]
        sm = sum(
            (F.coalesce(c, F.lit(0.0)) for c in cols), F.lit(0.0)
        )
        if match_type == "most_fields":
            score = sm
        else:
            mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
            score = mx + F.lit(tie_breaker) * (sm - mx)
        combined = wide.select("doc_id", score.alias("score"))

    bounded = (
        combined.select(
            "doc_id", F.col("score").cast("float").alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    from ..ranking import topk_rank_window

    return bounded.withColumn(
        "rank",
        F.row_number()
        .over(
            topk_rank_window(F.col("score").desc(), F.col("doc_id").asc())
        )
        .cast("int"),
    )
