"""Declarative corpus-curation pipeline — the end-to-end pre-training
funnel composed from the engine's text operators, in the canonical
order a 100-TB curation job runs them:

    lang-ID gate → quality gates → repetition gates → PII redaction →
    exact dedup (canonical doc per content fingerprint) →
    deterministic split sampling

Spark-first shape: ``annotate`` computes EVERY gate as a flag column in
ONE corpus pass (all the gates are map-side expressions; the only
shuffle in the whole funnel is the fingerprint window the dedup step
needs), so the funnel report is a single aggregate over the flags and
the curated output is one conjunctive filter — no per-step jobs, no
per-step materialization. At 100 TB that means the funnel costs one
scan + one content-hash shuffle regardless of how many gates run.

Every gate is deterministic and engine-portable (the DuckDB oracle
reproduces the whole funnel; gate entry `sample_documents` 'curated'
variant), which is what decontamination re-runs and holdout splits
require: membership is a pure function of the row, never of
partitioning, sampling RNG, or run order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import (
    fingerprint,
    lang_id,
    pii_redact,
    quality_features,
    repetition_features,
)

__all__ = ["CurateConfig", "annotate", "curate", "funnel"]


@dataclass(frozen=True)
class CurateConfig:
    """Frozen curation thresholds (Gopher/C4-style defaults)."""

    langs: tuple[str, ...] | None = ("en",)
    min_tokens: int = 5
    max_dup_bigram_frac: float = 0.75
    max_top_bigram_frac: float = 0.30
    redact_pii: bool = True
    dedup: bool = True
    sample_rate: float | None = None
    sample_salt: str = "train"
    text_col: str = "text"
    id_col: str = "doc_id"
    extra_gates: tuple[str, ...] = field(default_factory=tuple)
    """Additional SQL boolean expressions ANDed into the quality gate."""


def annotate(df: DataFrame, cfg: CurateConfig = CurateConfig()) -> DataFrame:
    """All gates as flag columns in one pass:

    lang_ok, quality_ok (library gates + min_tokens + extra_gates),
    rep_ok, passes (the conjunction), is_canonical (first passing doc
    per content fingerprint, doc-id-ascending — only flag that costs a
    shuffle), sampled, keep. PII redaction adds `redacted` + counts.
    """
    out = quality_features(df, cfg.text_col)
    out = repetition_features(out, cfg.text_col)
    if cfg.redact_pii:
        out = pii_redact(out, cfg.text_col)
    # one shared token materialization for lang-ID + the dedup fingerprint
    # (interpreted HOF lambdas re-evaluate captured trees — see textstats)
    from ..tokenizer import tokenize_expr

    out = out.withColumn("_cur_toks", tokenize_expr(cfg.text_col))
    toks = F.col("_cur_toks")
    lang_ok = (
        F.lit(True)
        if cfg.langs is None
        else lang_id(cfg.text_col, tokens=toks).isin(*cfg.langs)
    )
    q_ok = F.col("quality_ok") & (F.col("n_tokens") >= cfg.min_tokens)
    for expr in cfg.extra_gates:
        q_ok = q_ok & F.expr(expr)
    rep_ok = (F.col("dup_bigram_frac") <= cfg.max_dup_bigram_frac) & (
        F.col("top_bigram_frac") <= cfg.max_top_bigram_frac
    )
    out = (
        out.withColumn("lang_ok", lang_ok)
        .withColumn("q_ok", q_ok)
        .withColumn("rep_ok", rep_ok)
        .withColumn(
            "passes", F.col("lang_ok") & F.col("q_ok") & F.col("rep_ok")
        )
    )
    if cfg.dedup:
        # canonical = the first PASSING doc per content fingerprint
        # (passers sort first, then doc_id asc) — exact dedup keyed on
        # the normalized-token digest; the funnel's one shuffle
        w = Window.partitionBy(fingerprint(cfg.text_col, tokens=toks)).orderBy(
            F.col("passes").desc(), F.col(cfg.id_col).asc()
        )
        out = out.withColumn(
            "is_canonical",
            F.col("passes") & (F.row_number().over(w) == 1),
        )
    else:
        out = out.withColumn("is_canonical", F.col("passes"))
    if cfg.sample_rate is not None:
        from .hashing import h60_unit

        out = out.withColumn(
            "sampled",
            h60_unit(F.col(cfg.id_col).cast("string"), seed=cfg.sample_salt)
            < F.lit(cfg.sample_rate),
        )
    else:
        out = out.withColumn("sampled", F.lit(True))
    return out.withColumn(
        "keep", F.col("is_canonical") & F.col("sampled")
    ).drop("_cur_toks")


def curate(
    df: DataFrame, cfg: CurateConfig = CurateConfig()
) -> DataFrame:
    """The curated corpus: input columns (text swapped for `redacted`
    when PII redaction is on) for rows passing every gate."""
    flagged = annotate(df, cfg)
    kept = flagged.filter("keep")
    cols = []
    for c in df.columns:
        if c == cfg.text_col and cfg.redact_pii:
            cols.append(F.col("redacted").alias(cfg.text_col))
        else:
            cols.append(F.col(c))
    return kept.select(*cols)


def funnel(flagged: DataFrame) -> DataFrame:
    """One-row survival report over an ``annotate`` frame — a single
    aggregate (sums of flag conjunctions), never per-step jobs."""

    def n(c):
        return F.sum(c.cast("long"))

    return flagged.agg(
        F.count("*").alias("n_input"),
        n(F.col("lang_ok")).alias("n_lang"),
        n(F.col("lang_ok") & F.col("q_ok")).alias("n_quality"),
        n(F.col("passes")).alias("n_clean"),
        n(F.col("is_canonical")).alias("n_canonical"),
        n(F.col("keep")).alias("n_kept"),
    )
