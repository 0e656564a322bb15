"""Hybrid-search layer: score normalization + combination + top-k merge.

Replicates the reference's coordinator-side normalization workflow
(processor/NormalizationProcessorWorkflow.java:64-107) as one DataFrame
pipeline over a tall score table:

    (subq int, doc_id long, score double)   [+ optional query_id column]

→ window-normalize per sub-query (globally across shards, as the reference
  computes min/max/mean/std over all shards' results)
→ groupBy(doc_id) combine with the reference's exact edge-case semantics
→ orderBy(score desc, doc_id asc).limit(k)    [SORTING_TIE_BREAKER,
  reference processor/combination/ScoreCombiner.java:43-56]

Technique semantics verified line-by-line against the reference:

* min_max  (processor/normalization/MinMaxScoreNormalizationTechnique.java)
  - min/max per sub-query; max==min==s → 1.0 (SINGLE_RESULT_SCORE :46)
  - no lower_bounds → IGNORE mode: n=(s-min)/(max-min), n==0 → 0.001
    (MIN_SCORE :45, Mode.IGNORE :369-375)
  - lower_bounds per sub-query, modes (Mode enum :344-411):
      apply: (s-lb)/(max-lb) unless max<lb or s<lb → (s-min)/(max-min)
      clip:  s<min → 0; else apply-style without the s<lb fallback
      ignore: as no-bounds
* l2       (L2ScoreNormalizationTechnique.java:141-143): s/sqrt(Σs²);
  norm==0 → 0.001 (MIN_SCORE, not 0)
* z_score  (ZScoreNormalizationTechnique.java:204-222): sample std
  (commons-math DescriptiveStatistics = n-1); s==mean → max; std==0 → min;
  else (s-mean)/std, ≤0 → 0.001
* rrf      (RRFNormalizationTechnique.java:63-64,137): 1/(rank_constant +
  rank), rank 1-based over score desc / doc_id asc, rounded to 10 dp
  HALF_UP (BigDecimal :137) then cast float

Combination (processor/combination/*.java; missing sub-query slots are 0.0 —
ScoreCombiner.java:291-305 — so they count weight in arithmetic/rrf but are
skipped by geometric/harmonic):

* arithmetic_mean: Σ(w·s | s≥0) / (Σw over s≥0 ∪ missing); 0 if denom 0
* geometric_mean : exp(Σ(w·ln s | s>0)/Σw); 0 if no positive score
* harmonic_mean  : Σw / Σ(w/s) over s>0; 0 if none
* rrf            : Σ(w·s | s≥0) — weighted SUM, no division
  (RRFScoreCombinationTechnique.java:42-62)

Weights default to 1.0 per sub-query (ScoreCombinationUtil.java:88-90).
Max 5 sub-queries (query/HybridQueryBuilder.java:67).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ranking import topk_rank_window

MAX_NUMBER_OF_SUB_QUERIES = 5  # reference query/HybridQueryBuilder.java:67
MIN_SCORE = 0.001
SINGLE_RESULT_SCORE = 1.0
DEFAULT_RANK_CONSTANT = 60

NORMALIZATION_TECHNIQUES = ("min_max", "l2", "z_score", "rrf")
COMBINATION_TECHNIQUES = (
    "arithmetic_mean",
    "geometric_mean",
    "harmonic_mean",
    "rrf",
)


@dataclass
class LowerBound:
    """Per-sub-query lower bound for min_max (mode: apply|clip|ignore)."""

    mode: str = "apply"
    min_score: float = 0.0


def _minmax_expr(s, mn, mx, lb: LowerBound | None):
    plain = (s - mn) / (mx - mn)
    if lb is None or lb.mode == "ignore":
        n = plain
        n = F.when(n == 0.0, F.lit(MIN_SCORE)).otherwise(n)
    elif lb.mode == "apply":
        bounded = (s - F.lit(lb.min_score)) / (mx - F.lit(lb.min_score))
        n = F.when((mx < lb.min_score) | (s < lb.min_score), plain).otherwise(
            bounded
        )
    elif lb.mode == "clip":
        bounded = (s - F.lit(lb.min_score)) / (mx - F.lit(lb.min_score))
        n = F.when(s < mn, F.lit(0.0)).otherwise(
            F.when(mx < lb.min_score, plain).otherwise(bounded)
        )
    else:
        raise ValueError(f"invalid lower_bounds mode: {lb.mode}")
    # single-result edge case first: max==min==s → 1.0
    return F.when((mx == mn) & (mx == s), F.lit(SINGLE_RESULT_SCORE)).otherwise(n)


def normalize_scores(
    df: DataFrame,
    technique: str = "min_max",
    lower_bounds: list[LowerBound | None] | None = None,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``norm_score`` to a tall (subq, doc_id, score) DataFrame.

    group_cols: extra partition columns (e.g. query_id for batched search).

    Scale shape: per-sub-query statistics (min/max/Σs²/mean/std) are a
    ≤5·n_queries-row ``groupBy(subq).agg`` broadcast-joined back onto the
    tall table — NOT a ``Window.partitionBy(subq)``, which would move every
    sub-query's entire matched set through one reducer. rrf is the one
    technique that needs a true per-sub-query rank; its input contract is
    the reference's: callers bound each sub-query to ``pagination_depth``
    docs first (HybridCollectorManager.java:595-610), so the rank window
    runs over ≤ depth rows per sub-query.
    """
    if not 1 <= rank_constant <= 10000:
        raise ValueError("rank_constant must be in [1, 10000]")
    keys = [*group_cols, "subq"]
    s = F.col("score")

    def _join_stats(*aggs) -> DataFrame:
        stats = df.groupBy(*keys).agg(*aggs)
        return df.join(F.broadcast(stats), keys)

    if technique == "min_max":
        j = _join_stats(F.min(s).alias("_mn"), F.max(s).alias("_mx"))
        mn, mx = F.col("_mn"), F.col("_mx")
        if lower_bounds is None:
            out = _minmax_expr(s, mn, mx, None)
        else:
            if len(lower_bounds) > MAX_NUMBER_OF_SUB_QUERIES:
                raise ValueError(
                    "lower bounds array exceeds max number of sub-queries"
                )
            cases = None
            for jx, lb in enumerate(lower_bounds):
                e = _minmax_expr(s, mn, mx, lb)
                cases = (
                    F.when(F.col("subq") == jx, e)
                    if cases is None
                    else cases.when(F.col("subq") == jx, e)
                )
            out = cases
        drop = ["_mn", "_mx"]
    elif technique == "l2":
        j = _join_stats(F.sum(s * s).alias("_ss"))
        norm = F.sqrt(F.col("_ss"))
        out = F.when(norm == 0.0, F.lit(MIN_SCORE)).otherwise(s / norm)
        drop = ["_ss"]
    elif technique == "z_score":
        j = _join_stats(
            F.avg(s).alias("_mu"),
            F.stddev_samp(s).alias("_sd"),  # commons-math sample std (n-1)
            F.max(s).alias("_mx"),
            F.min(s).alias("_mn"),
        )
        mean, std = F.col("_mu"), F.col("_sd")
        mx, mn = F.col("_mx"), F.col("_mn")
        z = (s - mean) / std
        out = (
            F.when(s == mean, mx)
            .when(std.isNull() | (std == 0.0), mn)
            .otherwise(F.when(z <= 0.0, F.lit(MIN_SCORE)).otherwise(z))
        )
        drop = ["_mu", "_sd", "_mx", "_mn"]
    elif technique == "rrf":
        w = Window.partitionBy(*keys)
        rank = F.row_number().over(
            w.orderBy(F.desc("score"), F.asc("doc_id"))
        )
        # BigDecimal(1/(rc+rank), 10 dp, HALF_UP) → float: Spark round() is
        # HALF_UP for positive values, matching the reference bit pattern
        out = F.round(F.lit(1.0) / (F.lit(rank_constant) + rank), 10)
        return df.withColumn("norm_score", out.cast("float").cast("double"))
    else:
        raise ValueError(f"unknown normalization technique: {technique}")
    return j.withColumn("norm_score", out.cast("float").cast("double")).drop(
        *drop
    )


def combine_scores(
    df: DataFrame,
    n_subqueries: int,
    technique: str = "arithmetic_mean",
    weights: list[float] | None = None,
    score_col: str = "norm_score",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Combine per-sub-query normalized scores into one score per doc."""
    if n_subqueries > MAX_NUMBER_OF_SUB_QUERIES:
        raise ValueError(
            f"the number of sub-queries exceeds max allowed {MAX_NUMBER_OF_SUB_QUERIES}"
        )
    if weights is not None and len(weights) != n_subqueries:
        raise ValueError("number of weights must match number of sub-queries")
    wts = [
        (weights[j] if weights is not None and j < len(weights) else 1.0)
        for j in range(n_subqueries)
    ]
    total_w = float(sum(wts))
    s = F.col(score_col)
    w_expr = F.element_at(
        F.array(*[F.lit(float(x)) for x in wts]), F.col("subq") + 1
    )
    g = df.groupBy(*group_cols, "doc_id")
    if technique in ("arithmetic_mean", "rrf"):
        # missing slots are 0.0: they contribute 0 to the numerator but their
        # weight counts (s=0.0 passes the s>=0 gate)
        num = F.sum(F.when(s >= 0.0, w_expr * s).otherwise(F.lit(0.0)))
        neg_w = F.sum(F.when(s < 0.0, w_expr).otherwise(F.lit(0.0)))
        den = F.lit(total_w) - neg_w
        if technique == "arithmetic_mean":
            out = F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)
        else:  # rrf: weighted sum, no division (RRFScoreCombinationTechnique)
            out = F.when(den == 0.0, F.lit(0.0)).otherwise(num)
    elif technique == "geometric_mean":
        pos_w = F.sum(F.when(s > 0.0, w_expr).otherwise(F.lit(0.0)))
        ln_sum = F.sum(F.when(s > 0.0, w_expr * F.log(s)).otherwise(F.lit(0.0)))
        out = F.when(pos_w == 0.0, F.lit(0.0)).otherwise(F.exp(ln_sum / pos_w))
    elif technique == "harmonic_mean":
        pos_w = F.sum(F.when(s > 0.0, w_expr).otherwise(F.lit(0.0)))
        harm = F.sum(F.when(s > 0.0, w_expr / s).otherwise(F.lit(0.0)))
        out = F.when(harm > 0.0, pos_w / harm).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"unknown combination technique: {technique}")
    return g.agg(out.cast("float").cast("double").alias("score"))


def _tall_union(
    branches: list[DataFrame], pagination_depth: int | None
) -> DataFrame:
    """Union branch results into the tall (subq, doc_id, score) form.

    pagination_depth bounds EACH sub-query's retrieved set before
    normalization (reference HybridCollectorManager.java:595-610: per-shard
    per-sub-query retrieval size = pagination_depth when provided). The
    bound is a TakeOrderedAndProject (per-partition top-depth + driver
    merge) — no full sort, no single-partition shuffle."""
    if pagination_depth is not None and not 1 <= pagination_depth <= 10000:
        # reference: depth must be >0 (HybridQuery.java:70-73) and under the
        # max result window (HybridQueryBuilder.validatePaginationDepth)
        raise ValueError("pagination_depth must be in [1, 10000]")
    tall = None
    for j, b in enumerate(branches):
        t = b.select(
            F.lit(j).alias("subq"),
            F.col("doc_id").cast("long"),
            F.col("score").cast("double"),
        )
        if pagination_depth is not None:
            t = t.orderBy(F.desc("score"), F.asc("doc_id")).limit(
                pagination_depth
            )
        tall = t if tall is None else tall.unionAll(t)
    return tall


def hybrid_topk(
    branches: list[DataFrame],
    k: int = 10,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    lower_bounds: list[LowerBound | None] | None = None,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    pagination_depth: int | None = None,
) -> DataFrame:
    """Full hybrid pipeline over per-sub-query scored DataFrames, each with
    columns (doc_id, score). Returns (doc_id, score, rank).

    The branch DataFrames are unioned with a subq tag — the Spark analog of
    the reference's per-sub-query TopDocs lists (CompoundTopDocs)."""
    if not 1 <= len(branches) <= MAX_NUMBER_OF_SUB_QUERIES:
        raise ValueError(
            f"hybrid query accepts 1..{MAX_NUMBER_OF_SUB_QUERIES} sub-queries"
        )
    tall = _tall_union(branches, pagination_depth)
    normed = normalize_scores(
        tall, normalization, lower_bounds=lower_bounds, rank_constant=rank_constant
    )
    combined = combine_scores(
        normed, len(branches), combination, weights=weights
    )
    w = topk_rank_window(F.desc("score"), F.asc("doc_id"))
    return (
        combined.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


def hybrid_explain(
    branches: list[DataFrame],
    k: int = 10,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    lower_bounds: list[LowerBound | None] | None = None,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    pagination_depth: int | None = None,
) -> DataFrame:
    """Explain mode (reference hybrid_score_explanation response processor,
    processor/ExplanationResponseProcessor.java): for the final top-k docs,
    return one row per (doc, sub-query) with the raw score, normalized
    score, weight, technique names and the combined score — the
    intermediate columns the normal pipeline folds away."""
    wts = [
        (weights[j] if weights is not None and j < len(weights) else 1.0)
        for j in range(len(branches))
    ]
    tall = _tall_union(branches, pagination_depth)
    normed = normalize_scores(
        tall, normalization, lower_bounds=lower_bounds, rank_constant=rank_constant
    )
    combined = combine_scores(normed, len(branches), combination, weights=weights)
    top = combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        normed.join(
            top.withColumnRenamed("score", "combined_score"), "doc_id", "inner"
        )
        .withColumn(
            "weight",
            F.element_at(
                F.array(*[F.lit(float(x)) for x in wts]), F.col("subq") + 1
            ),
        )
        .withColumn("normalization_technique", F.lit(normalization))
        .withColumn("combination_technique", F.lit(combination))
        .select(
            "doc_id", "subq", F.col("score").alias("raw_score"),
            "norm_score", "weight", "combined_score",
            "normalization_technique", "combination_technique",
        )
    )


def inner_hits(
    parents: DataFrame,
    children: DataFrame,
    k_children: int = 3,
    child_score_col: str = "chunk_score",
    child_key_cols: tuple[str, ...] = ("chunk_idx",),
) -> DataFrame:
    """Inner hits: per-parent top child sub-documents attached to the parent
    result (reference query/HybridQueryBuilder.java:287-289,419-423 extracts
    inner-hit contexts; e2e HybridQueryInnerHitsIT). For a semantic-field
    corpus the children are the parent doc's chunks.

    parents:  (doc_id, score, rank) — the already-bounded top-k hits.
    children: (doc_id, <child_key_cols>, <child_score_col>, ...).

    Returns one row per (parent, child) with parent_score/parent_rank and a
    1-based child_rank ordered by child score desc / child keys asc.

    Scale shape: the k parent rows broadcast into a hash-semi join against
    the (potentially corpus-sized) child table, so child scoring stays a
    map-side pass; the per-parent rank window sees ≤ the matched children
    of k parents — never a global window."""
    p = F.broadcast(
        parents.select(
            "doc_id",
            F.col("score").alias("parent_score"),
            F.col("rank").alias("parent_rank"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(child_score_col), *[F.asc(c) for c in child_key_cols]
    )
    return (
        children.join(p, "doc_id")
        .withColumn("child_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("child_rank") <= k_children)
    )


def rerank_by_field(
    results: DataFrame, source: DataFrame, target_field: str, k: int | None = None
) -> DataFrame:
    """rerank.by_field: replace _score with a numeric field from the source
    doc and re-sort desc (reference processor/rerank/ByFieldRerankProcessor.java:72-208).
    results: (doc_id, score, ...); source must contain doc_id + target_field."""
    out = (
        results.select("doc_id")
        .join(source.select("doc_id", target_field), "doc_id")
        .withColumn("score", F.col(target_field).cast("double"))
        .drop(target_field)
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    if k is not None:
        out = out.limit(k)
    w = topk_rank_window(F.desc("score"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w).cast("int"))


def collapse_top1(
    scored: DataFrame, collapse_field: str, k: int = 10
) -> DataFrame:
    """Field-collapse: best doc per collapse-field value, then global top-k —
    the reference's HybridCollapsingTopDocsCollector (per-group hit queues,
    search/collector/HybridCollapsingTopDocsCollector.java:42-500) expressed
    as the Spark dedup-by-rank idiom."""
    wg = Window.partitionBy(collapse_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    best = scored.withColumn("_rn", F.row_number().over(wg)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
    w = topk_rank_window(F.desc("score"), F.asc("doc_id"))
    return (
        best.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
