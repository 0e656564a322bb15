"""function_score query — host FunctionScoreQuery semantics, Spark-first.

The host wraps a query and re-scores its matches with a list of scoring
functions (FunctionScoreQueryBuilder → Lucene FunctionScoreQuery):

* each function has an optional ``filter`` — it only APPLIES to docs the
  filter matches; non-applying functions are excluded from the combine;
* function kinds: ``weight`` (constant), ``field_value_factor``
  (modifier(factor·field)), decay (``gauss``/``exp``/``linear`` over a
  numeric or timestamp column), ``random_score`` (deterministic hash →
  [0,1)), and ``script_score`` — here a SQL expression over corpus
  columns with the query score exposed as ``_score`` (the Spark-native
  stand-in for the host's Painless script);
* ``score_mode`` combines the applying functions' values (multiply | sum
  | avg | first | max | min; no applying function → 1.0);
* the combined value is capped at ``max_boost``;
* ``boost_mode`` merges it with the query score (multiply | replace |
  sum | avg | max | min);
* ``min_score`` drops docs below the bound AFTER merging.

Spark shape: ONE projection. The wrapped query's full scored set joins
the corpus columns the functions need, then every function value, the
combine, the cap, and the merge are plain Catalyst column arithmetic —
whole-stage-codegen'd, zero extra shuffles, and the corpus join is on
the same doc_id key the scorer already grouped by. At 100 TB the cost
is the wrapped query's cost; the function math is free.

Reference behavior matched from the public OpenSearch/Lucene
FunctionScoreQuery + decay-function docs (functionscore package);
the reference repo under test composes with these host queries
unchanged, so parity here is what lets its hybrid branches carry
function_score sub-queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODIFIERS = {
    "none": lambda c: c,
    "log": lambda c: F.log10(c),
    "log1p": lambda c: F.log10(c + F.lit(1.0)),
    "log2p": lambda c: F.log10(c + F.lit(2.0)),
    "ln": lambda c: F.log(c),
    "ln1p": lambda c: F.log(c + F.lit(1.0)),
    "ln2p": lambda c: F.log(c + F.lit(2.0)),
    "square": lambda c: c * c,
    "sqrt": lambda c: F.sqrt(c),
    "reciprocal": lambda c: F.lit(1.0) / c,
}

_DURATIONS_S = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}

SCORE_MODES = ("multiply", "sum", "avg", "first", "max", "min")
BOOST_MODES = ("multiply", "replace", "sum", "avg", "max", "min")


@dataclass
class ScoreFunction:
    """One entry of the functions list. ``kind`` ∈ weight |
    field_value_factor | gauss | exp | linear | random_score |
    script_score; ``params`` carries that kind's body; ``filter`` is a
    SQL predicate over corpus columns (None = applies to every doc);
    ``weight`` multiplies the function's value (host per-function
    weight; a bare weight function is kind='weight')."""

    kind: str
    params: dict = field(default_factory=dict)
    filter: str | None = None
    weight: float | None = None


@dataclass
class FunctionScoreSpec:
    """Parsed function_score body. ``query`` is the wrapped sub-query
    (engine QuerySpec / compound spec; None = match_all)."""

    query: object | None = None
    functions: list[ScoreFunction] = field(default_factory=list)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"
    max_boost: float = float(3.402823466e38)  # host default FLT_MAX
    min_score: float | None = None
    boost: float = 1.0


def parse_duration_seconds(v) -> float:
    """'10d' / '3h' / '90s' / bare number → seconds (for timestamp
    decay scales/offsets)."""
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    if s and s[-1] in _DURATIONS_S:
        return float(s[:-1]) * _DURATIONS_S[s[-1]]
    return float(s)


def functions_from_json(items: list[dict]) -> list[ScoreFunction]:
    """The host functions-array JSON → ScoreFunction list. Each item may
    carry 'filter' (SQL predicate string) and 'weight' alongside exactly
    one function body; a filter/weight-only item is a weight function."""
    out: list[ScoreFunction] = []
    for it in items:
        it = dict(it)
        flt = it.pop("filter", None)
        if flt is not None and not isinstance(flt, str):
            raise ValueError(
                "function filter must be a SQL predicate string"
            )
        w = it.pop("weight", None)
        if len(it) > 1:
            raise ValueError(
                f"one function kind per entry, got {sorted(it)}"
            )
        if not it:
            if w is None:
                raise ValueError(
                    "a functions entry needs a function or a weight"
                )
            out.append(ScoreFunction("weight", {}, flt, float(w)))
            continue
        (kind, body), = it.items()
        if kind not in (
            "field_value_factor", "gauss", "exp", "linear",
            "random_score", "script_score",
        ):
            raise ValueError(f"unknown score function: {kind}")
        out.append(
            ScoreFunction(
                kind,
                dict(body) if isinstance(body, dict) else {"value": body},
                flt,
                None if w is None else float(w),
            )
        )
    return out


def _decay_value(kind: str, params: dict, dtypes: dict) -> Column:
    """gauss/exp/linear over ONE field: {"<field>": {"origin": o,
    "scale": s, "offset": 0, "decay": 0.5}}. Numeric fields use plain
    number distances; timestamp fields take ISO origins and duration
    strings ('10d') for scale/offset. The host's formulas:

      d      = max(0, |x − origin| − offset)
      gauss  = exp(−d² / 2σ²),  σ² = −scale² / (2·ln decay)
      exp    = exp(d · ln(decay) / scale)
      linear = max(0, (s − d) / s),  s = scale / (1 − decay)
    """
    if len(params) != 1:
        raise ValueError(f"{kind} decay takes exactly one field")
    (fname, body), = params.items()
    if fname not in dtypes:
        raise ValueError(f"decay field {fname!r} not in corpus")
    for req in ("origin", "scale"):
        if req not in body:
            raise ValueError(f"{kind} decay needs '{req}'")
    decay = float(body.get("decay", 0.5))
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    is_time = "timestamp" in dtypes[fname] or "date" in dtypes[fname]
    if is_time:
        x = F.unix_timestamp(F.col(fname)).cast("double")
        origin = F.unix_timestamp(
            F.lit(str(body["origin"])).cast("timestamp")
        ).cast("double")
        scale = parse_duration_seconds(body["scale"])
        offset = parse_duration_seconds(body.get("offset", 0))
    else:
        x = F.col(fname).cast("double")
        origin = F.lit(float(body["origin"]))
        scale = float(body["scale"])
        offset = float(body.get("offset", 0))
    if scale <= 0:
        raise ValueError("decay scale must be > 0")
    d = F.greatest(F.abs(x - origin) - F.lit(offset), F.lit(0.0))
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(d * d) / F.lit(2.0 * sigma2))
    if kind == "exp":
        return F.exp(d * F.lit(math.log(decay) / scale))
    s = scale / (1.0 - decay)
    return F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))


def _function_value(fn: ScoreFunction, dtypes: dict) -> Column:
    if fn.kind == "weight":
        v = F.lit(1.0)
    elif fn.kind == "field_value_factor":
        p = fn.params
        fname = p.get("field")
        if fname not in dtypes:
            raise ValueError(f"field_value_factor field {fname!r} not in corpus")
        mod = p.get("modifier", "none")
        if mod not in _MODIFIERS:
            raise ValueError(f"unknown modifier: {mod}")
        raw = F.col(fname).cast("double")
        if "missing" in p:
            raw = F.coalesce(raw, F.lit(float(p["missing"])))
        v = _MODIFIERS[mod](raw * F.lit(float(p.get("factor", 1.0))))
    elif fn.kind in ("gauss", "exp", "linear"):
        v = _decay_value(fn.kind, fn.params, dtypes)
    elif fn.kind == "random_score":
        # deterministic per (seed, field): xxhash64 → [0, 1). The host
        # seeds per request the same way; 'field' defaults to doc_id so
        # reruns reproduce (no per-partition RNG state to resume)
        seed = int(fn.params.get("seed", 0))
        fld = fn.params.get("field", "doc_id")
        if fld not in dtypes and fld != "doc_id":
            raise ValueError(f"random_score field {fld!r} not in corpus")
        h = F.xxhash64(F.lit(seed), F.col(fld))
        v = (F.pmod(h, F.lit(1 << 31))).cast("double") / F.lit(
            float(1 << 31)
        )
    elif fn.kind == "script_score":
        expr = fn.params.get("expr") or fn.params.get("source")
        if not expr:
            raise ValueError("script_score needs an 'expr' SQL expression")
        v = F.expr(expr).cast("double")
    else:
        raise ValueError(f"unknown score function: {fn.kind}")
    if fn.weight is not None:
        v = v * F.lit(float(fn.weight))
    return v


def function_score_scored(
    base: DataFrame,
    corpus: DataFrame,
    spec: FunctionScoreSpec,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) for the wrapped query's full scored set ``base``
    (doc_id, score) re-scored by ``spec``'s functions. One corpus join
    (broadcastable when the matched set is small — Catalyst/AQE picks),
    then pure column arithmetic."""
    if spec.score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if spec.boost_mode not in BOOST_MODES:
        raise ValueError(f"boost_mode must be one of {BOOST_MODES}")
    qs = F.col("score") * F.lit(float(spec.boost))
    if not spec.functions:
        out = base.select(
            "doc_id", qs.alias("score")
        )
        if spec.min_score is not None:
            out = out.filter(F.col("score") >= spec.min_score)
        return out

    side = corpus.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else corpus
    # `_score` binds the wrapped query's score inside script expressions
    # (the host Painless convention: `_score` in a script_score script)
    joined = base.join(side, "doc_id", "left").withColumn(
        "_score", F.col("score")
    )
    dtypes = dict(side.dtypes)

    vals, apps = [], []
    for fn in spec.functions:
        vals.append(_function_value(fn, dtypes))
        apps.append(
            F.expr(fn.filter) if fn.filter is not None else F.lit(True)
        )

    # combine applying functions without arrays: fold column-wise.
    # multiply: identity 1 for non-applying; sum/max/min: null-skipped
    # via conditional columns; avg = sum / count; first = coalesce in
    # list order.
    def _applied(v, a):
        return F.when(a, v)

    applied = [_applied(v, a) for v, a in zip(vals, apps)]
    n_app = sum(
        F.when(a, F.lit(1)).otherwise(F.lit(0)) for a in apps
    )
    if spec.score_mode == "multiply":
        combined = applied[0].otherwise(F.lit(1.0))
        for a in applied[1:]:
            combined = combined * a.otherwise(F.lit(1.0))
    elif spec.score_mode == "sum":
        combined = sum(a.otherwise(F.lit(0.0)) for a in applied)
    elif spec.score_mode == "avg":
        combined = sum(a.otherwise(F.lit(0.0)) for a in applied) / n_app
    elif spec.score_mode == "first":
        combined = F.coalesce(*applied) if len(applied) > 1 else applied[0]
    elif spec.score_mode == "max":
        combined = F.greatest(*applied) if len(applied) > 1 else applied[0]
    else:  # min
        combined = F.least(*applied) if len(applied) > 1 else applied[0]
    # no applying function → neutral 1.0 (host: query score unchanged
    # under the default multiply boost_mode)
    combined = F.when(n_app == 0, F.lit(1.0)).otherwise(
        F.coalesce(combined, F.lit(1.0))
    )
    combined = F.least(combined, F.lit(float(spec.max_boost)))

    bm = spec.boost_mode
    if bm == "multiply":
        final = qs * combined
    elif bm == "replace":
        final = combined
    elif bm == "sum":
        final = qs + combined
    elif bm == "avg":
        final = (qs + combined) / F.lit(2.0)
    elif bm == "max":
        final = F.greatest(qs, combined)
    else:  # min
        final = F.least(qs, combined)
    out = joined.select("doc_id", final.cast("double").alias("score"))
    if spec.min_score is not None:
        out = out.filter(F.col("score") >= spec.min_score)
    return out
