"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst (whole-stage-codegen, zero Python in the hot path):
token counting, language-ID heuristic, quality scoring, document
fingerprinting. Each has an exact ANSI-SQL twin used by the DuckDB
correctness oracle (see ``__spark_entry__.py``).

At 100 TB these are embarrassingly parallel map-side transforms: no
shuffle at all unless the caller aggregates afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import tokenize_expr

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + frozen so the SQL oracle can inline them.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans"],
}
LANG_MIN_RATIO = 0.05  # below this stopword hit-rate → 'unknown'


def token_count(col: Column | str) -> Column:
    """Whitespace/punct token count (the engine's frozen tokenizer)."""
    return F.size(tokenize_expr(col))


# GPT-2-style pretokenizer pattern, simplified to the subset valid in BOTH
# Java regex (Spark) and RE2 (the DuckDB oracle): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs — no lookahead
# (RE2 has none), applied to lowercased text. Whitespace-only spans are
# simply left unmatched (extract_all skips gaps), so the count is
# content-token-shaped like a BPE tokenizer's.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer regex
    — the cheap LLM-token budget estimator pipelines use when the real
    tokenizer is too expensive to run over 100 TB. Counts contractions,
    word runs, number runs, and punctuation runs as separate tokens
    (upper-bounds the real BPE count, which splits these further)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.col(col) if isinstance(col, str) else col),
            F.lit(BPE_TOKEN_PATTERN),
            F.lit(0),
        )
    )


def _ratio_in(tokens: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(words)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(
        F.lit(0.0)
    )


def lang_id(col: Column | str, *, tokens: Column | None = None) -> Column:
    """Stopword-ratio language ID: argmax over per-language stopword
    hit-rates, 'unknown' when the best rate is under LANG_MIN_RATIO.
    Ties broken by language code ascending (deterministic).

    Single argmax fold over the (ratio, lang) pairs — a nested
    filter/array_max shape would re-evaluate the pairs array per element
    under Spark's interpreted higher-order functions. Callers that
    already materialized a token-array column should pass it via
    ``tokens`` so the ratios read an attribute instead of re-tokenizing.
    """
    toks = tokenize_expr(col) if tokens is None else tokens
    pairs = F.array(
        *[
            F.struct(
                _ratio_in(toks, ws).alias("r"), F.lit(lang).alias("lang")
            )
            for lang, ws in sorted(STOPWORDS.items())
        ]
    )
    # max ratio wins; equal ratios → lexicographically smallest lang code
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1.0).alias("r"), F.lit("").alias("lang")),
        lambda acc, p: F.when(
            (p["r"] > acc["r"])
            | ((p["r"] == acc["r"]) & (p["lang"] < acc["lang"])),
            p,
        ).otherwise(acc),
    )
    return F.when(best["r"] >= LANG_MIN_RATIO, best["lang"]).otherwise(
        F.lit("unknown")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add quality-scoring feature columns:

    n_chars, n_tokens, mean_token_len, stopword_ratio (en),
    non_alnum_ratio, and a composite quality_ok flag (the usual
    Gopher/C4-style gates, frozen thresholds).
    """
    c = F.col(text_col)
    # materialized once per row — see repetition_features on why inlining
    # tokenize_expr into every consumer re-runs the regex split per use
    df = df.withColumn("_q_toks", tokenize_expr(text_col))
    toks = F.col("_q_toks")
    n_tok = F.size(toks)
    alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    out = (
        df.withColumn("n_chars_q", F.length(c))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_token_len",
            F.when(n_tok > 0, alnum / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn("stopword_ratio", _ratio_in(toks, STOPWORDS["en"]))
        .withColumn(
            "non_alnum_ratio",
            F.when(
                F.length(c) > 0, (F.length(c) - alnum) / F.length(c)
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("mean_token_len") >= 2.0)
        & (F.col("mean_token_len") <= 12.0)
        & (F.col("non_alnum_ratio") <= 0.6),
    ).drop("_q_toks")


def fingerprint(col: Column | str, *, tokens: Column | None = None) -> Column:
    """Document fingerprint: md5 over the normalized token stream —
    whitespace/case/punctuation-insensitive content hash (the rolling-hash
    fingerprint of the brief, realized as a content-defined digest).
    Pass a materialized token-array column via ``tokens`` to skip the
    re-tokenize."""
    toks = tokenize_expr(col) if tokens is None else tokens
    return F.md5(F.array_join(toks, " ").cast("binary"))


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style repetitious-content filters)
# ---------------------------------------------------------------------------
def _bigrams(toks: Column) -> Column:
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the Gopher-style repetition signals used to drop
    machine-generated / boilerplate docs from training corpora:

    * dup_token_frac   — 1 − distinct/total tokens;
    * dup_bigram_frac  — 1 − distinct/total token bigrams;
    * top_bigram_frac  — occurrences of the modal bigram / total bigrams.

    Pure map-side array expressions, zero shuffle. The token and bigram
    arrays are materialized as intermediate columns: Spark evaluates
    higher-order-function lambdas interpretively, re-evaluating any
    captured expression tree per element — inlining ``tokenize_expr``
    here would re-run the regex split O(n·d) times per row. Because the
    aliases are non-cheap and multiply-referenced, CollapseProject keeps
    the layered Projects, so each array is built exactly once per row.
    The modal-bigram count is a sorted run-length fold (O(n log n)),
    not a distinct×scan nested loop (O(d·n))."""
    out = df.withColumn("_rep_toks", tokenize_expr(text_col)).withColumn(
        "_rep_bi", _bigrams(F.col("_rep_toks"))
    )
    toks, bi = F.col("_rep_toks"), F.col("_rep_bi")
    n_t, n_b = F.size(toks), F.size(bi)
    # modal count = longest run in the sorted bigram array
    top = F.aggregate(
        F.array_sort(bi),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        out.withColumn(
            "dup_token_frac",
            F.when(
                n_t > 0, 1.0 - F.size(F.array_distinct(toks)) / n_t
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_bigram_frac",
            F.when(
                n_b > 0, 1.0 - F.size(F.array_distinct(bi)) / n_b
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_bigram_frac",
            F.when(n_b > 0, top / n_b).otherwise(F.lit(0.0)),
        )
        .drop("_rep_toks", "_rep_bi")
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, unigram_logprob): mean log10 probability of the doc's
    token occurrences under the corpus's OWN unigram MLE model
    (cf_t / total_cf) — the CCNet/RedPajama-style LM-perplexity quality
    gate, self-trained on the corpus since no external KenLM is available
    here; the pipeline shape (LM join + per-doc aggregate) is the same.
    Lower (more negative) = rarer vocabulary; boilerplate scores high.

    Two passes: corpus unigram counts (vocabulary-sized), then one
    explode + term-keyed join + doc-keyed mean. Docs with zero tokens are
    absent from the result (no occurrences to average)."""
    tall = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize_expr(text_col)).alias("term")
    )
    cf = tall.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    total = cf.agg(F.sum("cf")).collect()[0][0]
    return (
        tall.join(cf, "term")
        .groupBy("doc_id")
        .agg(
            F.avg(F.log10(F.col("cf") / F.lit(float(total)))).alias(
                "unigram_logprob"
            )
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing (map-side regex redaction)
# ---------------------------------------------------------------------------
# conservative patterns valid in BOTH Java regex (Spark) and RE2 (the
# DuckDB oracle): no lookarounds, no backreferences
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "long_number": (r"\b\d{13,19}\b", "<NUM>"),  # card/account-shaped runs
}


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``redacted`` (every PII pattern replaced by its placeholder,
    applied in PII_PATTERNS order over the lowercased text) and one
    ``n_<kind>`` match-count column per pattern. Map-side regexes only —
    the standard pre-training scrub pass shape."""
    low = F.lower(F.col(text_col))
    out = df
    red = low
    for kind, (pat, rep) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
        )
        red = F.regexp_replace(red, pat, rep)
    return out.withColumn("redacted", red)


# ---------------------------------------------------------------------------
# SQL oracle twins (DuckDB fragments)
# ---------------------------------------------------------------------------
def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def token_count_sql(expr: str) -> str:
    from ..tokenizer import tokenize_sql

    return f"len({tokenize_sql(expr)})"


def ratio_in_sql(toks_expr: str, words: list[str]) -> str:
    return (
        f"(CASE WHEN len({toks_expr}) > 0 THEN "
        f"len(list_filter({toks_expr}, t -> list_contains({_sql_list(words)}, t)))"
        f" / CAST(len({toks_expr}) AS DOUBLE) ELSE 0.0 END)"
    )


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible hash-based row sampling: keep rows whose
    h60(key # salt) / 2^60 < rate. Unlike df.sample(), membership is a
    pure function of the key — stable across runs, partitionings and
    engines (the DuckDB oracle reproduces it exactly), which is what a
    training-data pipeline needs for holdout splits and decontamination
    re-runs at 100 TB (a map-side filter, no shuffle, pushes to the scan).
    Different salts give independent samples for train/val/test splits."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    from .hashing import h60_unit

    return df.filter(
        h60_unit(F.col(key_col).cast("string"), seed=salt) < F.lit(rate)
    )
