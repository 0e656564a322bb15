"""Search-time aggregations — the OpenSearch `aggs` section computed over
a query's matched set, compiled to declarative DataFrame plans.

Parity target: the reference exercises metric, bucket, and pipeline
aggregations alongside hybrid queries
(src/test/java/org/opensearch/neuralsearch/query/aggregation/
MetricAggregationsWithHybridQueryIT.java,
BucketAggregationsWithHybridQueryIT.java,
PipelineAggregationsWithHybridQueryIT.java, and the dispatch in
search/query/HybridAggregationProcessor.java) — aggregations run over the
RAW matched set (pre-normalization scores), never the top-k page.

Spark-first shape: one `groupBy` per bucket LEVEL carries the bucket's
doc_count AND every metric sub-agg of that bucket in a single shuffle
(partial map-side combine; no per-metric jobs). Bucket sub-trees recurse
with the parent's key columns prepended to the grouping, so a
terms→date_histogram→metrics tree is two groupBys total, not one per
bucket. Pipeline aggs are Window/selection arithmetic over the (tiny)
bucket frame. Nothing here leaves the JVM: no UDFs, no collect on a
per-doc path.

`composite` is the 100-TB bucket path: unbounded key spaces page through
in key order with an exclusive `after` cursor, and the cursor predicate
is applied to the source EXPRESSIONS before the groupBy, so Catalyst
pushes it toward the scan — a deep page neither re-aggregates nor even
re-reads earlier buckets' rows (min/max pruning applies when the key is
the sort/partition column). `rare_terms` is exact (groupBy + filter)
rather than the reference's CuckooFilter approximation — same shuffle
either way in Spark, and the doc_count<=N filter prunes before any
ordering.

Spec format mirrors the OpenSearch DSL, one dict per agg:

    {"by_src": {"terms": {"field": "source", "size": 10},
                "aggs": {"mean_len": {"avg": {"field": "n_chars"}},
                         "cum": {"cumulative_sum":
                                 {"buckets_path": "mean_len"}}}}}

Filter predicates (filter / filters / range.from-to / adjacency_matrix)
are SQL expression strings over the scoped columns — portable between
Spark and the DuckDB oracle.

Results come back as a dict of path → DataFrame ("name" for top-level,
"parent>child" for sub-trees, parent key columns included), so every
level stays a distributed frame the caller can join, write, or collect.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["compute_aggs"]

_METRICS = {
    "avg", "sum", "min", "max", "value_count", "stats", "extended_stats",
    "cardinality", "percentiles", "percentile_ranks", "weighted_avg",
    "matrix_stats", "boxplot",
}
# metrics that cannot be expressed as single-pass aggregate expressions:
# they get their own compile branch (an extra bounded pass over the
# scope, never per-bucket jobs)
_MULTI_PASS_METRICS = {"median_absolute_deviation", "string_stats"}
_BUCKETS = {
    "terms", "histogram", "date_histogram", "range", "date_range",
    "filter", "filters", "missing", "global", "sampler",
    "significant_terms", "significant_text", "adjacency_matrix", "nested",
    "composite", "multi_terms", "rare_terms", "diversified_sampler",
}
_PIPELINES = {
    "avg_bucket", "sum_bucket", "min_bucket", "max_bucket", "stats_bucket",
    "extended_stats_bucket", "percentiles_bucket",
    "cumulative_sum", "derivative", "bucket_script", "bucket_selector",
    "bucket_sort", "moving_fn", "moving_avg", "serial_diff",
}

_MOVING_FNS = {
    "unweightedAvg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "stdDev": F.stddev_pop,
}

_DEF_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)

# auto_date_histogram rounding ladder (multiple, unit suffix, unit secs)
# — the reference's AutoDateHistogramAggregationBuilder rungs up to days;
# month/quarter/year continue as calendar rungs in _compile
_AUTO_DH_LADDER = (
    (1, "s", 1), (5, "s", 1), (10, "s", 1), (30, "s", 1),
    (1, "m", 60), (5, "m", 60), (10, "m", 60), (30, "m", 60),
    (1, "h", 3600), (3, "h", 3600), (12, "h", 3600),
    (1, "d", 86400), (7, "d", 86400),
)

_RATE_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}

_CAL_SECONDS = {
    "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _subst(script: str, params: dict | None) -> str:
    """bucket_script/bucket_selector variable binding: whole-word
    replacement of each param var with its buckets_path column."""
    for var, colname in (params or {}).items():
        script = re.sub(rf"\b{re.escape(var)}\b", colname, script)
    return script


def _pct_label(p: float) -> str:
    s = ("%g" % p).replace(".", "_")
    return f"p{s}"


def _metric_exprs(name: str, typ: str, body: dict) -> list[Column]:
    """Aggregate expressions for one metric agg — all built-ins, all
    eligible for partial aggregation."""
    fld = body.get("field")
    c = F.col(fld) if fld is not None else None
    if typ == "avg":
        return [F.avg(c).alias(name)]
    if typ == "sum":
        return [F.sum(c).alias(name)]
    if typ == "min":
        return [F.min(c).alias(name)]
    if typ == "max":
        return [F.max(c).alias(name)]
    if typ == "value_count":
        return [F.count(c).alias(name)]
    if typ == "stats":
        return [
            F.count(c).alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
        ]
    if typ == "extended_stats":
        return [
            F.count(c).alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            F.sum(c).alias(f"{name}_sum"),
            F.sum(c * c).alias(f"{name}_sum_of_squares"),
            F.var_pop(c).alias(f"{name}_variance"),
            F.stddev_pop(c).alias(f"{name}_std_deviation"),
        ]
    if typ == "cardinality":
        # OpenSearch cardinality is HLL-approximate; exact by default
        # here for oracle-ability, HLL on request for the 100-TB path
        if body.get("approx"):
            return [
                F.approx_count_distinct(
                    c, rsd=float(body.get("rsd", 0.05))
                ).alias(name)
            ]
        return [F.countDistinct(c).alias(name)]
    if typ == "percentiles":
        pcts = [float(p) for p in body.get("percents", _DEF_PERCENTS)]
        frac = ", ".join(repr(p / 100.0) for p in pcts)
        arr = F.expr(f"percentile({fld}, array({frac}))")
        return [
            arr.getItem(i).alias(f"{name}_{_pct_label(p)}")
            for i, p in enumerate(pcts)
        ]
    if typ == "percentile_ranks":
        vals = [float(v) for v in body["values"]]
        return [
            (
                F.avg(F.when(c <= F.lit(v), 1.0).otherwise(0.0)) * 100.0
            ).alias(f"{name}_rank_{('%g' % v).replace('.', '_')}")
            for v in vals
        ]
    if typ == "matrix_stats":
        # per-field moments + pairwise covariance/correlation in ONE
        # aggregate (Spark's population definitions for variance and
        # the standardized 3rd/4th moments)
        fields = body["fields"]
        exprs = []
        for f_ in fields:
            c_ = F.col(f_)
            exprs += [
                F.count(c_).alias(f"{name}_{f_}_count"),
                F.avg(c_).alias(f"{name}_{f_}_mean"),
                F.var_pop(c_).alias(f"{name}_{f_}_variance"),
                F.skewness(c_).alias(f"{name}_{f_}_skewness"),
                F.kurtosis(c_).alias(f"{name}_{f_}_kurtosis"),
            ]
        for i, fa in enumerate(fields):
            for fb in fields[i + 1:]:
                exprs += [
                    F.covar_pop(F.col(fa), F.col(fb)).alias(
                        f"{name}_{fa}_{fb}_covariance"
                    ),
                    F.corr(F.col(fa), F.col(fb)).alias(
                        f"{name}_{fa}_{fb}_correlation"
                    ),
                ]
        return exprs
    if typ == "boxplot":
        # exact five-number summary (the reference's boxplot agg is
        # TDigest-approximate; exact here for oracle-ability — one
        # percentile aggregate carries all five)
        arr = F.expr(f"percentile({fld}, array(0.0, 0.25, 0.5, 0.75, 1.0))")
        labels = ("min", "q1", "q2", "q3", "max")
        return [
            arr.getItem(i).alias(f"{name}_{lab}")
            for i, lab in enumerate(labels)
        ]
    if typ == "weighted_avg":
        # Σ(v·w)/Σ(w) over rows where BOTH are present (OpenSearch skips
        # docs missing the value; weight default handled by caller data)
        cv = F.col(body["value"]["field"])
        cw = F.col(body["weight"]["field"])
        both = cv.isNotNull() & cw.isNotNull()
        return [
            (
                F.sum(F.when(both, cv * cw)) / F.sum(F.when(both, cw))
            ).alias(name)
        ]
    raise ValueError(f"unknown metric aggregation: {typ}")


def _split(spec: dict) -> tuple[str, dict, dict]:
    """({'terms': {...}, 'aggs': {...}}) → (type, body, sub_aggs)."""
    sub = spec.get("aggs", {}) or {}
    kinds = [k for k in spec if k != "aggs"]
    if len(kinds) != 1:
        raise ValueError(
            f"aggregation spec needs exactly one type key, got {kinds}"
        )
    typ = kinds[0]
    return typ, spec[typ] or {}, sub


def _interval_seconds(iv: str) -> int:
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", iv)
    if not m:
        raise ValueError(f"unsupported fixed_interval: {iv!r}")
    n, unit = int(m.group(1)), m.group(2)
    mult = {"ms": 0, "s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
    if unit == "ms":
        raise ValueError("sub-second fixed_interval not supported")
    return n * mult


def _key_expr(typ: str, body: dict) -> Column:
    """Single-key bucket types → the grouping expression."""
    fld = body["field"]
    c = F.col(fld)
    if typ == "terms":
        return c
    if typ == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        return (
            F.floor((c - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
            + F.lit(offset)
        )
    if typ == "date_histogram":
        if "calendar_interval" in body:
            unit = body["calendar_interval"]
            if unit not in {
                "minute", "hour", "day", "week", "month", "quarter", "year",
            }:
                raise ValueError(f"unsupported calendar_interval: {unit}")
            return F.date_trunc(unit, c)
        secs = _interval_seconds(body["fixed_interval"])
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / F.lit(secs)) * F.lit(secs)
        )
    raise ValueError(f"not a keyed bucket type: {typ}")


def _enumerated_buckets(typ: str, body: dict) -> list[tuple[str, str]]:
    """Filter-family bucket types → [(bucket_key, sql_predicate)]."""
    if typ == "filter":
        return [(body.get("key", "filter"), body["predicate"])]
    if typ == "filters":
        return list(body["filters"].items())
    if typ == "missing":
        return [("missing", f"{body['field']} IS NULL")]
    if typ in {"range", "date_range"}:
        fld = body["field"]
        out = []
        for r in body["ranges"]:
            lo, hi = r.get("from"), r.get("to")

            def _lit(v):
                return f"'{v}'" if typ == "date_range" else repr(float(v))

            preds = []
            if lo is not None:
                preds.append(f"{fld} >= {_lit(lo)}")
            if hi is not None:
                preds.append(f"{fld} < {_lit(hi)}")
            key = r.get("key") or (
                f"{lo if lo is not None else '*'}-"
                f"{hi if hi is not None else '*'}"
            )
            out.append((key, " AND ".join(preds) or "TRUE"))
        return out
    if typ == "adjacency_matrix":
        named = list(body["filters"].items())
        out = [(k, p) for k, p in named]
        for i, (ka, pa) in enumerate(named):
            for kb, pb in named[i + 1:]:
                out.append((f"{ka}&{kb}", f"({pa}) AND ({pb})"))
        return out
    raise ValueError(f"not an enumerated bucket type: {typ}")


_CAL_STEP = {
    "minute": "interval 1 minute", "hour": "interval 1 hour",
    "day": "interval 1 day", "week": "interval 7 day",
    "month": "interval 1 month", "quarter": "interval 3 month",
    "year": "interval 1 year",
}


def _dense_fill(
    buckets: DataFrame, typ: str, body: dict, key: str,
    parent_keys: list[str],
) -> DataFrame:
    """min_doc_count=0 for histogram/date_histogram: emit EMPTY buckets
    across the observed key range, optionally widened by
    ``extended_bounds`` (snapped to bucket boundaries). The domain is
    generated per parent bucket with ``F.sequence`` — bucket-count rows,
    never doc rows — and the sparse buckets left-join back onto it.
    Empty buckets carry doc_count=0 and NULL metric sub-aggs (pipeline
    aggs like derivative then see the gap-less series OpenSearch
    guarantees)."""
    grp = (
        buckets.groupBy(*parent_keys) if parent_keys else buckets.groupBy()
    )
    bounds = grp.agg(F.min(key).alias("__lo"), F.max(key).alias("__hi"))
    eb = body.get("extended_bounds")
    if typ == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))

        def snap(v):
            return (
                F.floor((F.lit(float(v)) - offset) / interval) * interval
                + offset
            )

        if eb:
            bounds = bounds.withColumn(
                "__lo", F.least("__lo", snap(eb["min"]))
            ).withColumn("__hi", F.greatest("__hi", snap(eb["max"])))
        lo_i = ((F.col("__lo") - offset) / interval).cast("long")
        hi_i = ((F.col("__hi") - offset) / interval).cast("long")
        dom = bounds.select(
            *parent_keys, F.explode(F.sequence(lo_i, hi_i)).alias("__i")
        ).select(
            *parent_keys,
            (F.col("__i") * F.lit(interval) + offset)
            .cast("double")
            .alias(key),
        )
    else:
        if "calendar_interval" in body:
            unit = body["calendar_interval"]
            step = _CAL_STEP[unit]

            def snap(v):
                return F.date_trunc(unit, F.lit(v).cast("timestamp"))

        else:
            secs = _interval_seconds(body["fixed_interval"])
            step = f"interval {secs} second"

            def snap(v):
                return F.timestamp_seconds(
                    F.floor(
                        F.unix_timestamp(F.lit(v).cast("timestamp"))
                        / F.lit(secs)
                    )
                    * F.lit(secs)
                )

        if eb:
            bounds = bounds.withColumn(
                "__lo", F.least("__lo", snap(eb["min"]))
            ).withColumn("__hi", F.greatest("__hi", snap(eb["max"])))
        dom = bounds.select(
            *parent_keys,
            F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(key),
        )
    joined = dom.join(buckets, parent_keys + [key], "left")
    return joined.fillna({"doc_count": 0})


def _collect_metric_exprs(sub: dict) -> tuple[list[Column], dict]:
    """Metric sub-aggs → one flat expr list; returns (exprs, leftovers)
    where leftovers are bucket/pipeline/top_hits sub-aggs handled after
    the groupBy."""
    exprs: list[Column] = []
    rest: dict = {}
    for name, spec in sub.items():
        typ, body, ssub = _split(spec)
        if typ in _METRICS:
            if ssub:
                raise ValueError(f"metric agg {name!r} cannot have sub-aggs")
            exprs.extend(_metric_exprs(name, typ, body))
        else:
            rest[name] = spec
    return exprs, rest


def _bucket_order(typ: str, body: dict, key: str) -> list[Column]:
    if typ == "terms" or typ == "significant_terms":
        order = body.get("order")
        if order:
            (col, direction), = order.items()
            col = "doc_count" if col == "_count" else col
            first = (
                F.col(col).asc() if direction == "asc" else F.col(col).desc()
            )
            return [first, F.col(key).asc()]
        if typ == "significant_terms":
            return [F.col("score").desc(), F.col(key).asc()]
        return [F.col("doc_count").desc(), F.col(key).asc()]
    return [F.col(key).asc()]


def _apply_size(
    df: DataFrame, order: list[Column], size: int | None,
    parent_keys: list[str],
) -> DataFrame:
    """Order buckets; truncate to `size` per parent bucket (Window when
    nested, plain sort+limit at top level)."""
    if size is None:
        return df.orderBy(*([F.col(k) for k in parent_keys] + order))
    if parent_keys:
        w = Window.partitionBy(*parent_keys).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= size)
            .drop("__rn")
            .orderBy(*([F.col(k) for k in parent_keys] + order))
        )
    return df.orderBy(*order).limit(size)


def _top_hits(
    df: DataFrame, name: str, body: dict, parent_keys: list[str],
) -> DataFrame:
    """Per-bucket top hits by score desc, doc_id-asc tiebreak — one
    Window pass, no per-bucket jobs."""
    size = int(body.get("size", 3))
    cols = body.get("_source", ["doc_id", "score"])
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    if parent_keys:
        w = Window.partitionBy(*parent_keys).orderBy(*order)
    else:
        w = Window.partitionBy(F.lit(1)).orderBy(*order)
    keep = [c for c in parent_keys if c not in cols]
    return (
        df.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= size)
        .select(*keep, *cols, "hit_rank")
        .orderBy(*[F.col(k) for k in parent_keys], "hit_rank")
    )


def _apply_pipelines(
    buckets: DataFrame, key: str | list[str], pipelines: dict,
    parent_keys: list[str], out: dict, path: str,
) -> DataFrame:
    """Pipeline aggs over a bucket frame. Sequential semantics: skips
    (derivative's first bucket) are NULL rows, matching OpenSearch's
    gap-less default. Runs on the bucket frame (|buckets| rows), so
    single-partition Windows are fine by construction. `key` may be a
    list (composite / multi_terms buckets order by the key tuple)."""
    key_cols = [key] if isinstance(key, str) else list(key)
    part = (
        Window.partitionBy(*parent_keys)
        if parent_keys
        else Window.partitionBy(F.lit(1))
    )
    seq = part.orderBy(*[F.col(k).asc() for k in key_cols])
    for name, spec in pipelines.items():
        typ, body, _ = _split(spec)
        src = body.get("buckets_path")
        src = "doc_count" if src == "_count" else src
        if typ == "cumulative_sum":
            buckets = buckets.withColumn(
                name,
                F.sum(src).over(
                    seq.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        elif typ == "derivative":
            buckets = buckets.withColumn(
                name, F.col(src) - F.lag(src).over(seq)
            )
        elif typ in {"moving_fn", "moving_avg"}:
            # sliding window of `window` buckets; shift=0 (the default)
            # means the window ENDS at the previous bucket, shift=window
            # slides it to include the current one — OpenSearch
            # MovingFunctions semantics. moving_avg is the deprecated
            # alias for moving_fn unweightedAvg.
            win = int(body.get("window", 5))
            shift = int(body.get("shift", 0))
            fn_name = (
                "unweightedAvg" if typ == "moving_avg"
                else body.get("script", "unweightedAvg")
            )
            # accept both bare names and the documented
            # "MovingFunctions.<fn>(values)" script form
            m = re.search(r"MovingFunctions\.(\w+)", fn_name)
            if m:
                fn_name = m.group(1)
            if fn_name not in _MOVING_FNS:
                raise ValueError(
                    f"moving_fn supports {sorted(_MOVING_FNS)}, got "
                    f"{fn_name!r}"
                )
            frame = seq.rowsBetween(shift - win, shift - 1)
            buckets = buckets.withColumn(
                name, _MOVING_FNS[fn_name](src).over(frame)
            )
        elif typ == "serial_diff":
            lag_n = int(body.get("lag", 1))
            buckets = buckets.withColumn(
                name, F.col(src) - F.lag(src, lag_n).over(seq)
            )
        elif typ in {"avg_bucket", "sum_bucket", "min_bucket",
                     "max_bucket", "stats_bucket",
                     "extended_stats_bucket", "percentiles_bucket"}:
            c = F.col(src)
            if typ == "percentiles_bucket":
                pcts = [
                    float(p) for p in body.get("percents", _DEF_PERCENTS)
                ]
                frac = ", ".join(repr(p / 100.0) for p in pcts)
                arr = F.expr(f"percentile({src}, array({frac}))")
                fn = [
                    arr.getItem(i).alias(_pct_label(p))
                    for i, p in enumerate(pcts)
                ]
            else:
                fn = {
                    "avg_bucket": [F.avg(src).alias("value")],
                    "sum_bucket": [F.sum(src).alias("value")],
                    "min_bucket": [F.min(src).alias("value")],
                    "max_bucket": [F.max(src).alias("value")],
                    "stats_bucket": [
                        F.count(src).alias("count"),
                        F.min(src).alias("min"),
                        F.max(src).alias("max"),
                        F.avg(src).alias("avg"),
                        F.sum(src).alias("sum"),
                    ],
                    "extended_stats_bucket": [
                        F.count(src).alias("count"),
                        F.min(src).alias("min"),
                        F.max(src).alias("max"),
                        F.avg(src).alias("avg"),
                        F.sum(src).alias("sum"),
                        F.sum(c * c).alias("sum_of_squares"),
                        F.var_pop(src).alias("variance"),
                        F.stddev_pop(src).alias("std_deviation"),
                    ],
                }[typ]
            grp = (
                buckets.groupBy(*parent_keys) if parent_keys
                else buckets.groupBy()
            )
            out[f"{path}>{name}"] = grp.agg(*fn)
        elif typ == "bucket_script":
            buckets = buckets.withColumn(
                name, F.expr(_subst(body["script"], body.get("params")))
            )
        elif typ == "bucket_selector":
            buckets = buckets.filter(
                F.expr(_subst(body["script"], body.get("params")))
            )
        elif typ == "bucket_sort":
            sorts = [
                F.col(c).asc() if d == "asc" else F.col(c).desc()
                for s in body.get("sort", [])
                for c, d in s.items()
            ] + [F.col(k).asc() for k in key_cols]
            buckets = _apply_size(
                buckets, sorts, body.get("size"), parent_keys
            )
        else:
            raise ValueError(f"unknown pipeline aggregation: {typ}")
    return buckets


def _compile(
    df: DataFrame, name: str, spec: dict, out: dict, path: str,
    parent_keys: list[str], full: DataFrame | None,
) -> None:
    typ, body, sub = _split(spec)
    mpath = f"{path}{name}"

    if typ in _METRICS:
        grp = df.groupBy(*parent_keys) if parent_keys else df.groupBy()
        out[mpath] = grp.agg(*_metric_exprs(name, typ, body))
        return
    if typ == "top_hits":
        out[mpath] = _top_hits(df, name, body, parent_keys)
        return
    if typ == "top_metrics":
        # metric fields read off the best row(s) per bucket by an
        # arbitrary sort — one Window pass, like top_hits but projecting
        # the metric columns plus the sort key
        size = int(body.get("size", 1))
        sorts = [
            F.col(c).asc() if d == "asc" else F.col(c).desc()
            for s in body["sort"]
            for c, d in s.items()
        ] + [F.col("doc_id").asc()]
        mcols = [m["field"] for m in body["metrics"]]
        scols = [c for s in body["sort"] for c in s]
        w = (
            Window.partitionBy(*parent_keys).orderBy(*sorts)
            if parent_keys
            else Window.partitionBy(F.lit(1)).orderBy(*sorts)
        )
        out[mpath] = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= size)
            .select(
                *parent_keys,
                *dict.fromkeys(scols + mcols),
                F.col("__rn").alias("metric_rank"),
            )
            .orderBy(*[F.col(k) for k in parent_keys], "metric_rank")
        )
        return
    if typ == "scripted_metric":
        # restricted scripted_metric: map_script is a SQL expression per
        # row, reduce_script one of sum/avg/min/max — the deterministic
        # subset of the reference's painless scripts (the aggregation IT
        # uses a summing scripted metric); arbitrary scripts are out of
        # scope by design
        red = body.get("reduce_script", "sum")
        fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
        if red not in fn:
            raise ValueError(
                f"scripted_metric reduce_script must be one of {set(fn)}"
            )
        grp = df.groupBy(*parent_keys) if parent_keys else df.groupBy()
        out[mpath] = grp.agg(
            fn[red](F.expr(body["map_script"])).alias(name)
        )
        return
    if typ == "median_absolute_deviation":
        # exact MAD = median(|x − median(x)|) — the reference's agg is
        # TDigest-approximate (MedianAbsoluteDeviationAggregator); exact
        # here for oracle-ability (DuckDB `mad()` agrees). Two grouped
        # passes joined on the bucket key: medians are one row per
        # bucket, so the join side is broadcast-small by construction.
        fld = body["field"]
        grp = df.groupBy(*parent_keys) if parent_keys else df.groupBy()
        med = grp.agg(
            F.expr(f"percentile({fld}, 0.5)").alias("__med")
        )
        if parent_keys:
            joined = df.join(F.broadcast(med), parent_keys)
            grp2 = joined.groupBy(*parent_keys)
        else:
            joined = df.crossJoin(F.broadcast(med))
            grp2 = joined.groupBy()
        out[mpath] = grp2.agg(
            F.expr(f"percentile(abs({fld} - __med), 0.5)").alias(name)
        )
        return

    if typ == "string_stats":
        # count / min_length / max_length / avg_length in the main
        # grouped pass; Shannon entropy (log2, per-character distribution
        # across the bucket — StringStatsAggregator semantics) via one
        # explode(split) → two groupBys, joined back on the bucket key.
        # The char-keyed frame is |chars| rows map-side but collapses to
        # ≤ |alphabet|·|buckets| after the first combine — no skew risk.
        fld = body["field"]
        ln = F.length(F.col(fld))
        grp = df.groupBy(*parent_keys) if parent_keys else df.groupBy()
        main = grp.agg(
            F.count(F.col(fld)).alias(f"{name}_count"),
            F.min(ln).alias(f"{name}_min_length"),
            F.max(ln).alias(f"{name}_max_length"),
            F.avg(ln).alias(f"{name}_avg_length"),
        )
        chars = df.select(
            *parent_keys,
            F.explode(F.split(F.col(fld), "")).alias("__ch"),
        ).filter(F.col("__ch") != "")
        cc = chars.groupBy(*parent_keys, "__ch").agg(
            F.count("*").alias("__c")
        )
        tw = (
            Window.partitionBy(*parent_keys)
            if parent_keys else Window.partitionBy(F.lit(1))
        )
        p = F.col("__c") / F.sum("__c").over(tw)
        egrp = (
            cc.withColumn("__p", p).groupBy(*parent_keys)
            if parent_keys
            else cc.withColumn("__p", p).groupBy()
        )
        ent = egrp.agg(
            (-F.sum(F.col("__p") * F.log2("__p"))).alias(f"{name}_entropy")
        )
        if parent_keys:
            out[mpath] = main.join(ent, parent_keys, "left")
        else:
            out[mpath] = main.crossJoin(ent)
        return

    if typ == "auto_date_histogram":
        # the reference picks the smallest rounding from a fixed ladder
        # that keeps the bucket count under `buckets`
        # (AutoDateHistogramAggregationBuilder ladder). The data span is
        # one 1-row aggregate (coordinator-cheap pre-pass), then the agg
        # proceeds as an ordinary date_histogram at the chosen interval.
        fld = body["field"]
        target = int(body.get("buckets", 10))
        row = df.agg(
            F.min(F.unix_timestamp(fld)).alias("lo"),
            F.max(F.unix_timestamp(fld)).alias("hi"),
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        span = max(0, (hi or 0) - (lo or 0))
        chosen_fixed: str | None = None
        chosen_cal: str | None = None
        for n, unit, secs in _AUTO_DH_LADDER:
            if span / (n * secs) <= target:
                chosen_fixed = f"{n}{unit}"
                break
        else:
            # beyond 7d: calendar month / quarter / year rungs
            for unit, secs in (
                ("month", 2_592_000), ("quarter", 7_776_000),
                ("year", 31_536_000),
            ):
                if span / secs <= target:
                    chosen_cal = unit
                    break
            else:
                chosen_cal = "year"
        body = dict(body)
        if chosen_fixed is not None:
            body["fixed_interval"] = chosen_fixed
            iv_label = chosen_fixed
        else:
            body["calendar_interval"] = chosen_cal
            iv_label = f"1{chosen_cal[0]}" if chosen_cal != "quarter" else "1q"
        body.setdefault("min_doc_count", 1)
        spec = {"date_histogram": body}
        if sub:
            spec["aggs"] = sub
        _compile(df, name, spec, out, path, parent_keys, full)
        out[mpath] = out[mpath].withColumn("interval", F.lit(iv_label))
        return

    if typ not in _BUCKETS:
        raise ValueError(f"unknown aggregation type: {typ}")

    metric_exprs, rest = _collect_metric_exprs(sub)
    pipelines = {
        n: s for n, s in rest.items() if _split(s)[0] in _PIPELINES
    }
    deeper = {n: s for n, s in rest.items() if n not in pipelines}

    if typ == "global":
        if full is None:
            raise ValueError("global agg needs the full (unscoped) frame")
        scope = full.withColumn("score", F.lit(1.0))
        for n, s in sub.items():
            _compile(scope, n, s, out, f"{mpath}>", [], full)
        out[mpath] = scope.groupBy().agg(F.count("*").alias("doc_count"))
        return

    if typ == "nested":
        # nested docs = an array<struct> column; one explode turns the
        # scope into the nested-doc frame (doc_count counts nested docs,
        # OpenSearch nested-agg semantics). Struct fields must not shadow
        # outer columns — raise rather than silently prefer one.
        pathcol = body["path"]
        fields = [
            f.name for f in df.schema[pathcol].dataType.elementType.fields
        ]
        outer = [c for c in df.columns if c != pathcol]
        clash = set(fields) & set(outer)
        if clash:
            raise ValueError(
                f"nested path {pathcol!r} fields shadow outer columns: "
                f"{sorted(clash)}"
            )
        exploded = df.select(
            *outer, F.explode(pathcol).alias("__nested")
        ).select(*outer, "__nested.*")
        grp = (
            exploded.groupBy(*parent_keys) if parent_keys
            else exploded.groupBy()
        )
        out[mpath] = grp.agg(F.count("*").alias("doc_count"))
        for n, s in sub.items():
            _compile(exploded, n, s, out, f"{mpath}>", parent_keys, full)
        return

    if typ == "sampler":
        shard = int(body.get("shard_size", 100))
        w = Window.partitionBy(F.lit(1)).orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        scope = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= shard)
            .drop("__rn")
        )
        for n, s in sub.items():
            _compile(scope, n, s, out, f"{mpath}>", parent_keys, full)
        grp = (
            scope.groupBy(*parent_keys) if parent_keys else scope.groupBy()
        )
        out[mpath] = grp.agg(F.count("*").alias("doc_count"))
        return

    if typ == "diversified_sampler":
        # sampler with a per-value cap: at most max_docs_per_value of any
        # one `field` value make the shard_size pool — two Window passes,
        # first keyed by the diversity value (distributes by that key),
        # then the global score cut
        shard = int(body.get("shard_size", 100))
        per_val = int(body.get("max_docs_per_value", 1))
        order = [F.col("score").desc(), F.col("doc_id").asc()]
        wv = Window.partitionBy(body["field"]).orderBy(*order)
        wg = Window.partitionBy(F.lit(1)).orderBy(*order)
        scope = (
            df.withColumn("__dv", F.row_number().over(wv))
            .filter(F.col("__dv") <= per_val)
            .drop("__dv")
            .withColumn("__rn", F.row_number().over(wg))
            .filter(F.col("__rn") <= shard)
            .drop("__rn")
        )
        for n, s in sub.items():
            _compile(scope, n, s, out, f"{mpath}>", parent_keys, full)
        grp = (
            scope.groupBy(*parent_keys) if parent_keys else scope.groupBy()
        )
        out[mpath] = grp.agg(F.count("*").alias("doc_count"))
        return

    if typ == "composite":
        # the scale-path bucket pagination: no top-N truncation, pages of
        # `size` buckets in key order, `after` resumes EXCLUSIVE of the
        # last key. The after predicate is applied to the source
        # expressions BEFORE the groupBy, so Catalyst pushes it toward
        # the scan and a deep page never re-aggregates earlier buckets.
        size = int(body.get("size", 10))
        names, exprs = [], []
        for srcspec in body["sources"]:
            (sname, sspec), = srcspec.items()
            (styp, sbody), = sspec.items()
            names.append(f"{name}_{sname}")
            exprs.append(_key_expr(styp, sbody))
        keyed = df
        for n_, e_ in zip(names, exprs):
            keyed = keyed.withColumn(n_, e_)
        after = body.get("after")
        if after:
            vals = [after[n.split(f"{name}_", 1)[1]] for n in names]
            pred = F.lit(False)
            for i in range(len(names)):
                eqs = F.lit(True)
                for j in range(i):
                    eqs = eqs & (F.col(names[j]) == F.lit(vals[j]))
                pred = pred | (eqs & (F.col(names[i]) > F.lit(vals[i])))
            keyed = keyed.filter(pred)
        grp_keys = parent_keys + names
        buckets = keyed.groupBy(*grp_keys).agg(
            F.count("*").alias("doc_count"), *metric_exprs
        )
        order = [F.col(n).asc() for n in names]
        buckets = _apply_size(buckets, order, size, parent_keys)
        buckets = _apply_pipelines(
            buckets, names, pipelines, parent_keys, out, mpath
        )
        out[mpath] = buckets
        if deeper:
            survivors = buckets.select(*grp_keys)
            scoped = keyed.join(
                F.broadcast(survivors), grp_keys, "left_semi"
            )
            for n, s in deeper.items():
                _compile(scoped, n, s, out, f"{mpath}>", grp_keys, full)
        return

    if typ == "multi_terms":
        # terms over a key tuple; one groupBy on all key fields, ordered
        # by doc_count desc (OpenSearch default) with the key tuple as
        # tiebreak
        size = int(body.get("size", 10))
        fields = [t["field"] for t in body["terms"]]
        names = [f"{name}_key_{f}" for f in fields]
        keyed = df
        for n_, f_ in zip(names, fields):
            keyed = keyed.withColumn(n_, F.col(f_))
        grp_keys = parent_keys + names
        buckets = keyed.groupBy(*grp_keys).agg(
            F.count("*").alias("doc_count"), *metric_exprs
        )
        mdc = int(body.get("min_doc_count", 1))
        if mdc > 0:
            buckets = buckets.filter(F.col("doc_count") >= mdc)
        order = [F.col("doc_count").desc()] + [
            F.col(n).asc() for n in names
        ]
        buckets = _apply_size(buckets, order, size, parent_keys)
        buckets = _apply_pipelines(
            buckets, names, pipelines, parent_keys, out, mpath
        )
        out[mpath] = buckets
        if deeper:
            survivors = buckets.select(*grp_keys)
            scoped = keyed.join(
                F.broadcast(survivors), grp_keys, "left_semi"
            )
            for n, s in deeper.items():
                _compile(scoped, n, s, out, f"{mpath}>", grp_keys, full)
        return

    if typ == "rare_terms":
        # the long-tail complement of terms: buckets with doc_count <=
        # max_doc_count, ascending. Exact (one groupBy + filter) rather
        # than the reference's CuckooFilter approximation — the groupBy
        # is the same shuffle either way in Spark; the filter prunes
        # before any ordering so no top-N heap is involved
        mdc = int(body.get("max_doc_count", 1))
        key = f"{name}_key"
        keyed = df.withColumn(key, F.col(body["field"]))
        grp_keys = parent_keys + [key]
        buckets = keyed.groupBy(*grp_keys).agg(
            F.count("*").alias("doc_count"), *metric_exprs
        ).filter(F.col("doc_count") <= mdc)
        order = [F.col("doc_count").asc(), F.col(key).asc()]
        buckets = _apply_size(buckets, order, None, parent_keys)
        buckets = _apply_pipelines(
            buckets, key, pipelines, parent_keys, out, mpath
        )
        out[mpath] = buckets
        if deeper:
            survivors = buckets.select(*grp_keys)
            scoped = keyed.join(
                F.broadcast(survivors), grp_keys, "left_semi"
            )
            for n, s in deeper.items():
                _compile(scoped, n, s, out, f"{mpath}>", grp_keys, full)
        return

    if typ in {"significant_terms", "significant_text"}:
        if full is None:
            raise ValueError(f"{typ} needs the full (background) frame")
        fld = body["field"]
        size = int(body.get("size", 10))
        key = f"{name}_key"
        if typ == "significant_terms":
            fg = df.groupBy(F.col(fld).alias(key)).agg(
                F.count("*").alias("doc_count")
            )
            bg = full.groupBy(F.col(fld).alias(key)).agg(
                F.count("*").alias("bg_count")
            )
            # vocabulary-bounded keyed field → broadcast the background
            joined = fg.join(F.broadcast(bg), key)
        else:
            # significant_text: the bucket keys are the ANALYZED tokens
            # of a text field; doc_count counts documents containing the
            # token (array_distinct before explode — per-doc dedup
            # map-side, no extra shuffle). The background join stays a
            # token-keyed equi-join, NOT a broadcast: at corpus scale the
            # text vocabulary is unbounded. min_doc_count prunes the
            # foreground BEFORE the join.
            from ..tokenizer import tokenize_expr

            min_dc = int(body.get("min_doc_count", 3))

            def doc_tokens(frame):
                return frame.select(
                    F.explode(
                        F.array_distinct(tokenize_expr(fld))
                    ).alias(key)
                )

            fg = (
                doc_tokens(df)
                .groupBy(key)
                .agg(F.count("*").alias("doc_count"))
                .filter(F.col("doc_count") >= min_dc)
            )
            bg = doc_tokens(full).groupBy(key).agg(
                F.count("*").alias("bg_count")
            )
            joined = fg.join(bg, key)
        fg_tot = df.count()
        bg_tot = full.count()
        # JLH score (Lucene JLHScore.java semantics): published formula,
        # (fg% − bg%) · (fg% / bg%)
        fgp = F.col("doc_count") / F.lit(float(fg_tot))
        bgp = F.col("bg_count") / F.lit(float(bg_tot))
        scored = joined.withColumn(
            "score",
            F.when(
                (fgp > bgp) & (F.col("bg_count") > 0),
                (fgp - bgp) * (fgp / bgp),
            ).otherwise(F.lit(0.0)),
        ).filter(F.col("score") > 0)
        out[mpath] = _apply_size(
            scored,
            _bucket_order("significant_terms", body, key),
            size,
            [],
        )
        return

    if typ in {"filter", "filters", "missing", "range", "date_range",
               "adjacency_matrix"}:
        enum = _enumerated_buckets(typ, body)
        key = f"{name}_key"
        frames = []
        for bkey, pred in enum:
            part = df.filter(F.expr(pred))
            grp = (
                part.groupBy(*parent_keys) if parent_keys
                else part.groupBy()
            )
            b = grp.agg(
                F.count("*").alias("doc_count"), *metric_exprs
            ).withColumn(key, F.lit(bkey))
            frames.append(b.select(*parent_keys, key, *[
                c for c in b.columns if c not in parent_keys + [key]
            ]))
            for n, s in deeper.items():
                _compile(
                    part.withColumn(key, F.lit(bkey)), n, s, out,
                    f"{mpath}[{bkey}]>", parent_keys + [key], full,
                )
        buckets = frames[0]
        for fr in frames[1:]:
            buckets = buckets.unionByName(fr)
        # single-bucket 'filter' keeps all rows (even zero-count buckets
        # appear — count(*) over empty grouped-all is handled by Spark
        # returning a 0 row only for grouped-all; enumerated unions are
        # per-predicate so empties vanish, matching min_doc_count=1)
        buckets = _apply_pipelines(
            buckets, key, pipelines, parent_keys, out, mpath
        )
        out[mpath] = buckets.orderBy(
            *[F.col(k) for k in parent_keys], F.col(key).asc()
        )
        return

    # keyed buckets: terms / histogram / date_histogram
    key = f"{name}_key"
    # `rate` metrics are only meaningful under a date_histogram: total
    # (sum of field, or doc_count) scaled to a per-`unit` rate by the
    # bucket interval. Pulled out of `deeper` here because the scale
    # factor needs the ENCLOSING bucket's interval — still one expr in
    # the same single groupBy (RateAggregator semantics; calendar
    # month/quarter/year parents refuse, their spans vary).
    for rname in [
        n for n, s in deeper.items() if _split(s)[0] == "rate"
    ]:
        if typ != "date_histogram":
            raise ValueError("rate aggregation requires a date_histogram "
                             "parent")
        rbody = _split(deeper.pop(rname))[1]
        unit = rbody.get("unit", "day")
        if unit not in _RATE_UNIT_SECONDS:
            raise ValueError(
                f"rate unit must be one of {sorted(_RATE_UNIT_SECONDS)}, "
                f"got {unit!r}"
            )
        if "calendar_interval" in body:
            cal = body["calendar_interval"]
            if cal not in _CAL_SECONDS:
                raise ValueError(
                    f"rate under calendar_interval {cal!r} is unsupported "
                    "(variable-length bucket)"
                )
            parent_secs = _CAL_SECONDS[cal]
        else:
            parent_secs = _interval_seconds(body["fixed_interval"])
        total = (
            F.sum(F.col(rbody["field"])) if rbody.get("field")
            else F.count("*")
        )
        factor = _RATE_UNIT_SECONDS[unit] / float(parent_secs)
        metric_exprs = metric_exprs + [
            (total * F.lit(factor)).alias(rname)
        ]
    keyed = df.withColumn(key, _key_expr(typ, body))
    grp_keys = parent_keys + [key]
    buckets = keyed.groupBy(*grp_keys).agg(
        F.count("*").alias("doc_count"), *metric_exprs
    )
    mdc = int(body.get("min_doc_count", 1))
    if mdc > 0:
        buckets = buckets.filter(F.col("doc_count") >= mdc)
    elif typ in {"histogram", "date_histogram"}:
        buckets = _dense_fill(buckets, typ, body, key, parent_keys)
    size = body.get("size")
    if typ == "terms" and size is None:
        size = 10
    buckets = _apply_size(
        buckets, _bucket_order(typ, body, key), size, parent_keys
    )
    buckets = _apply_pipelines(
        buckets, key, pipelines, parent_keys, out, mpath
    )
    out[mpath] = buckets
    if deeper:
        # sub-aggs are computed for the SURVIVING buckets only
        # (post-min_doc_count/size), per OpenSearch semantics: semi-join
        # the doc frame down to them, then recurse one level deeper
        survivors = buckets.select(*grp_keys)
        scoped = keyed.join(F.broadcast(survivors), grp_keys, "left_semi")
        for n, s in deeper.items():
            _compile(scoped, n, s, out, f"{mpath}>", grp_keys, full)


def compute_aggs(
    scoped: DataFrame,
    aggs: dict,
    *,
    full: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Compute an OpenSearch-style `aggs` tree over `scoped` — the
    query's matched docs joined back to their source columns (must carry
    `doc_id` and `score`; pass the corpus itself with score=1.0 for
    match_all scope). `full` is the unscoped corpus, needed only by
    `global` and `significant_terms`.

    Returns {path: DataFrame} — "name" per top-level agg,
    "parent>child" for nested levels (parent key columns included),
    "bucket>pipeline" for bucket-metric pipelines.
    """
    out: dict[str, DataFrame] = {}
    for name, spec in aggs.items():
        _compile(scoped, name, spec, out, "", [], full)
    return out
