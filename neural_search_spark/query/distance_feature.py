"""distance_feature query — proximity-to-origin static scoring (host
DistanceFeatureQueryBuilder → Lucene ``LongPoint.newDistanceFeatureQuery``;
the host accepts date and geo_point origins, this engine scores numeric
and timestamp columns — geo needs a geo type the corpus schema lacks).

    score = boost × pivot / (pivot + |value − origin|)

Docs with a NULL field never match (the host requires the field present
for the query to score it). Spark-first shape: exactly like
rank_feature, the "index" for a static per-doc signal at 100 TB is
parquet column pruning — the scan reads (id, field), the IS NOT NULL
filter pushes down, and the scoring expression is one
whole-stage-codegen projection. No shuffle, no stats pass, no UDF.

Timestamp fields: origin may be an ISO-8601 string or epoch seconds and
pivot a duration string (``"7d"``, ``"3h"``, ``"90m"``, ``"45s"`` — the
host's time-unit subset that needs no calendar arithmetic); both are
normalized to seconds and the column is compared as epoch seconds.

Reference trail: Lucene ``LongField.newDistanceFeatureQuery`` /
``LongPoint.newDistanceFeatureQuery`` (the published formula above);
OpenSearch ``DistanceFeatureQueryBuilder`` parameter contract. The
reference plugin relies on the host for this query (no code of its
own) — cited as the semantics source, not ported code.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DURATION_RX = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(d|h|m|s)\s*$", re.I)
_UNIT_SECONDS = {"d": 86400.0, "h": 3600.0, "m": 60.0, "s": 1.0}


def parse_duration_seconds(value) -> float:
    """``"7d"``-style duration (or a bare number) → seconds."""
    if isinstance(value, (int, float)):
        return float(value)
    m = _DURATION_RX.match(str(value))
    if not m:
        raise ValueError(
            f"pivot must be a number or Nd/Nh/Nm/Ns duration, got {value!r}"
        )
    return float(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]


def distance_feature_scored(
    docs: DataFrame,
    field: str,
    origin,
    pivot,
    boost: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with a non-null ``field`` → (doc_id, score
    double). Numeric columns take numeric origin/pivot; timestamp/date
    columns take an ISO (or epoch-seconds) origin and a duration pivot."""
    dtype = dict(docs.dtypes).get(field)
    if dtype is None:
        raise ValueError(f"distance_feature field {field!r} not in schema")
    col = F.col(field)
    if dtype in ("timestamp", "date", "timestamp_ntz"):
        col = col.cast(T.TimestampType()).cast("double")  # epoch seconds
        origin_v = (
            float(origin)
            if isinstance(origin, (int, float))
            else None
        )
        if origin_v is None:
            # ISO-8601 string → epoch seconds, resolved Catalyst-side so
            # the session timezone (pinned UTC) applies
            origin_expr = F.lit(str(origin)).cast(
                T.TimestampType()
            ).cast("double")
        else:
            origin_expr = F.lit(origin_v)
        pivot_v = parse_duration_seconds(pivot)
    else:
        origin_expr = F.lit(float(origin))
        pivot_v = parse_duration_seconds(pivot)
    if pivot_v <= 0:
        raise ValueError("distance_feature pivot must be positive")
    dist = F.abs(col - origin_expr)
    return docs.filter(F.col(field).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        (F.lit(float(boost)) * F.lit(pivot_v) / (F.lit(pivot_v) + dist)).alias(
            "score"
        ),
    )
