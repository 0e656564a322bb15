"""rank_feature query — static per-doc relevance signals folded into the
score (host RankFeatureQueryBuilder → Lucene ``FeatureField`` queries:
newSaturationQuery / newLogQuery / newSigmoidQuery / newLinearQuery).

The reference stores features as strictly-positive floats in a
rank_feature field and scores matching docs ``boost × fn(S)`` with no tf
or idf component; docs without the feature never match. The Spark-first
shape is a plain numeric corpus column: the "index" for a static signal
at 100 TB is parquet column pruning — the scan reads exactly (id, S),
the predicate ``S > 0`` pushes down, and the scoring expression is one
whole-stage-codegen projection. No shuffle, no UDF, no stats pass —
except saturation's default pivot, which Lucene derives from index
stats (``FeatureField.computePivot``: geometric mean of the field's
values); the analog here is one small agg computing
``exp(avg(ln(S)))`` over the positive values.

Functions (RankFeatureQueryBuilder's four, same parameter contracts):

* saturation:  S / (S + pivot)        (pivot > 0; default = geo-mean)
* log:         ln(scaling_factor + S) (scaling_factor required, ≥ 1 in
               the host so the score stays non-negative)
* sigmoid:     S^exp / (S^exp + pivot^exp)  (both required, > 0)
* linear:      S

Scores are query-independent, so rank_feature is only useful inside a
bool SHOULD / hybrid branch — exactly the host's documented usage — and
composes through the engine's BoolSpec/HybridSpec machinery unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNCTIONS = ("saturation", "log", "sigmoid", "linear")


def rank_feature_scored(
    docs: DataFrame,
    feature_col: str,
    function: str = "saturation",
    pivot: float | None = None,
    scaling_factor: float | None = None,
    exponent: float | None = None,
    boost: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with a positive ``feature_col`` → (doc_id,
    score double). See the module docstring for the function contracts."""
    if function not in FUNCTIONS:
        raise ValueError(
            f"rank_feature function must be one of {FUNCTIONS}, "
            f"got {function!r}"
        )
    S = F.col(feature_col).cast("double")
    scoped = docs.filter(S.isNotNull() & (S > 0))
    if function == "saturation":
        if pivot is None:
            # Lucene FeatureField.computePivot: geometric mean of the
            # field's (positive) values — exp(mean(ln S)), one tiny agg
            row = scoped.agg(F.avg(F.ln(S)).alias("m")).collect()[0]
            if row["m"] is None:
                return docs.sparkSession.range(0).select(
                    F.col("id").alias("doc_id"),
                    F.lit(0.0).alias("score"),
                )
            pivot = math.exp(float(row["m"]))
        if pivot <= 0:
            raise ValueError("saturation pivot must be positive")
        expr = S / (S + F.lit(float(pivot)))
    elif function == "log":
        if scaling_factor is None:
            raise ValueError("log needs scaling_factor")
        if scaling_factor < 1.0:
            # host validation: scalingFactor >= 1 keeps ln(...) ≥ 0 for
            # positive features (RankFeatureQueryBuilder.LogBuilder)
            raise ValueError("log scaling_factor must be >= 1")
        expr = F.ln(F.lit(float(scaling_factor)) + S)
    elif function == "sigmoid":
        if pivot is None or exponent is None:
            raise ValueError("sigmoid needs pivot and exponent")
        if pivot <= 0 or exponent <= 0:
            raise ValueError("sigmoid pivot and exponent must be positive")
        sp = F.pow(S, F.lit(float(exponent)))
        expr = sp / (sp + F.lit(float(pivot) ** float(exponent)))
    else:  # linear
        expr = S
    return scoped.select(
        F.col(id_col).alias("doc_id"),
        (F.lit(float(boost)) * expr).alias("score"),
    )
