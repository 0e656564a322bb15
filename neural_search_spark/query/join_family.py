"""Join-family queries — `has_child`, `has_parent`, `parent_id`, and
`nested` over the conversation/turn hierarchy (the host's parent-join
module and nested-object queries; the reference plugin composes with
them through the host query DSL, e.g. hybrid branches wrapped in
`nested` — `query/HybridQueryBuilder` accepts any host sub-query).

Hierarchy mapping. The host's join field puts parent and child docs in
ONE index, routed to the same shard by the parent id; nested objects
are child Lucene docs stored block-adjacent to their root. This
engine's document unit is a TURN (doc_id = hash(conv_id, turn_idx)),
and the input table fixes exactly one hierarchy: parent = conversation
(`conv_id`), children = its turns. So:

* `has_child` / `nested`  → hits are PARENTS (conversations): parents
  whose MATCHING children satisfy the count gates, scored by
  `score_mode` over the matching children's scores —
  none (constant 1), min, max, sum, avg (ScoreMode in Lucene's
  ToParentBlockJoinQuery / the join module's ParentScoreMode). The
  host's `nested` defaults to avg, `has_child` to none; both run the
  same math here because a conversation IS the block-root of its turn
  docs. `min_children`/`max_children` count MATCHING children only
  (HasChildQueryBuilder semantics).
* `has_parent`            → hits are CHILDREN (turns) of matching
  parents. Parent docs carry no fields of their own in the transcripts
  schema, so the parent query runs over the DERIVED parent metadata
  frame (``parent_frame``: n_turns, first/last ts, role/tool counts,
  total_chars) as a boolean SQL expression; `score=false` (the host
  default) gives every child constant 1.0, and an optional numeric
  ``score_expr`` over the same frame plays the score=true role
  (documented divergence: the host can run full-text parent queries
  because its parents are real docs).
* `parent_id`             → the children of ONE named parent,
  constant-score (ParentIdQuery) — a pushed-down equality predicate.

Scale shape (100 TB): child scoring is whatever plan the wrapped query
already has; attaching the parent key is a doc_id equi-join against the
corpus projection (both sides doc_id-keyed), and the parent combine is
ONE conv_id-keyed aggregation — the irreducible shuffle, same key a
bucketed-by-conv corpus co-locates. Parents are NOT broadcast blindly:
a 10^12-turn corpus has ~10^10 conversations, so `has_parent` uses a
plain equi-join on the filtered parent frame and lets AQE downgrade it
to broadcast when the filter is selective.

Reference trail: OpenSearch join module `HasChildQueryBuilder` /
`HasParentQueryBuilder` / `ParentIdQueryBuilder` and Lucene
`ToParentBlockJoinQuery` ScoreMode — semantics source, not ported code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARENT_KEY = "conv_id"

SCORE_MODES = ("none", "min", "max", "sum", "avg")


def _require_parent_key(corpus: DataFrame, parent_key: str) -> None:
    if parent_key not in corpus.columns:
        raise ValueError(
            f"join-family queries need the parent key column "
            f"{parent_key!r} on the corpus (transcripts-shaped input); "
            f"got columns {corpus.columns}"
        )


def parent_frame(
    corpus: DataFrame, parent_key: str = PARENT_KEY
) -> DataFrame:
    """One row per parent (conversation): the derived metadata the
    `has_parent` query filters on — n_turns, first_ts/last_ts, n_roles,
    n_tool_turns, total_chars. The host's parent docs are real docs
    with their own fields; transcripts carry none, so this frame IS the
    parent document surface (see module docstring)."""
    _require_parent_key(corpus, parent_key)
    aggs = [F.count("*").alias("n_turns")]
    cols = set(corpus.columns)
    if "ts" in cols:
        aggs += [F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")]
    if "role" in cols:
        aggs.append(F.countDistinct("role").alias("n_roles"))
    if "tool" in cols:
        aggs.append(
            F.count(F.when(F.col("tool").isNotNull(), 1)).alias(
                "n_tool_turns"
            )
        )
    if "text" in cols:
        aggs.append(F.sum(F.length("text")).alias("total_chars"))
    return corpus.groupBy(parent_key).agg(*aggs)


def has_child_scored(
    child_scored: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    parent_key: str = PARENT_KEY,
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """(parent_key, score) for every parent whose matching children pass
    the count gates. ``child_scored`` is any (doc_id, score) frame — the
    wrapped query's full matched set. One doc_id equi-join to attach the
    parent key, one parent-keyed aggregation."""
    if score_mode not in SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}"
        )
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children must be >= min_children")
    _require_parent_key(corpus, parent_key)
    kids = corpus.select(F.col(id_col).alias("doc_id"), parent_key)
    j = child_scored.select(
        "doc_id", F.col("score").cast("double").alias("score")
    ).join(kids, "doc_id")
    mode_expr = {
        "none": F.lit(1.0),
        "min": F.min("score"),
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.avg("score"),
    }[score_mode]
    g = j.groupBy(parent_key).agg(
        F.count("*").alias("n_match"), mode_expr.alias("score")
    )
    g = g.filter(F.col("n_match") >= min_children)
    if max_children is not None:
        g = g.filter(F.col("n_match") <= max_children)
    return g.select(parent_key, F.col("score").cast("double"))


def has_child_inner_hits(
    child_scored: DataFrame,
    corpus: DataFrame,
    parents: DataFrame,
    id_col: str = "doc_id",
    parent_key: str = PARENT_KEY,
    size: int = 3,
) -> DataFrame:
    """Per-parent top-``size`` matching children for an already-bounded
    parent hit set (the host's inner_hits block): (parent_key, doc_id,
    child_score, child_rank). ``parents`` is k-bounded, so it broadcasts
    — the child frame is pruned by a semi-join before the per-parent
    window runs."""
    from pyspark.sql import Window

    _require_parent_key(corpus, parent_key)
    kids = corpus.select(F.col(id_col).alias("doc_id"), parent_key)
    j = (
        child_scored.select(
            "doc_id", F.col("score").cast("double").alias("child_score")
        )
        .join(kids, "doc_id")
        .join(F.broadcast(parents.select(parent_key)), parent_key, "left_semi")
    )
    w = Window.partitionBy(parent_key).orderBy(
        F.desc("child_score"), F.asc("doc_id")
    )
    return (
        j.withColumn("child_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("child_rank") <= size)
        .select(parent_key, "doc_id", "child_score", "child_rank")
    )


def has_parent_children(
    corpus: DataFrame,
    parent_filter: str,
    id_col: str = "doc_id",
    parent_key: str = PARENT_KEY,
    score_expr: str | None = None,
) -> DataFrame:
    """(doc_id, score) — every child (turn) of a parent matching the
    boolean SQL ``parent_filter`` over ``parent_frame``'s columns.
    Constant 1.0 per child (host score=false default) unless a numeric
    ``score_expr`` over the same frame is given (the score=true role).
    Plain equi-join on the filtered parent frame — AQE downgrades it to
    broadcast when the filter is selective; never forced (parents are
    corpus-sized at web scale)."""
    pf = parent_frame(corpus, parent_key).filter(F.expr(parent_filter))
    sel = pf.select(
        parent_key,
        (
            F.expr(score_expr) if score_expr is not None else F.lit(1.0)
        ).cast("double").alias("score"),
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"), parent_key)
        .join(sel, parent_key)
        .select("doc_id", "score")
    )


def parent_id_children(
    corpus: DataFrame,
    parent_id: str,
    id_col: str = "doc_id",
    parent_key: str = PARENT_KEY,
) -> DataFrame:
    """(doc_id, score) — children of ONE named parent, constant score
    (ParentIdQuery): a pushed-down equality predicate on the parent key
    column."""
    _require_parent_key(corpus, parent_key)
    return corpus.filter(F.col(parent_key) == parent_id).select(
        F.col(id_col).alias("doc_id"), F.lit(1.0).cast("double").alias("score")
    )
