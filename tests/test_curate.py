"""extras/curate.py — the declarative curation funnel: one-pass flags,
exact-dedup canonicals, deterministic sampling, and the one-aggregate
funnel report."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.extras.curate import (
    CurateConfig,
    annotate,
    curate,
    funnel,
)
from neural_search_spark.index.build import doc_id_col


@pytest.fixture(scope="module")
def docs(spark, transcripts_df):
    return transcripts_df.withColumn("doc_id", doc_id_col()).select(
        "doc_id", "text", "role"
    )


def test_funnel_monotone_and_flags(docs):
    flagged = annotate(docs, CurateConfig(sample_rate=0.5))
    row = funnel(flagged).collect()[0]
    assert (
        row["n_input"] >= row["n_lang"] >= row["n_quality"]
        >= row["n_clean"] >= row["n_canonical"] >= row["n_kept"]
    )
    assert row["n_kept"] > 0


def test_exact_dedup_keeps_one_canonical(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "The quick, brown FOX jumps over the lazy dog today!"),
        (3, "an entirely different document about model training runs"),
        (4, "zz"),  # fails min_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurateConfig(langs=None, min_tokens=3)
    flagged = annotate(df, cfg)
    got = {r["doc_id"]: r for r in flagged.collect()}
    # docs 1 and 2 share a fingerprint (case/punct-insensitive):
    # the smaller doc_id is canonical
    assert got[1]["is_canonical"] and not got[2]["is_canonical"]
    assert got[3]["is_canonical"]
    assert not got[4]["keep"]
    kept = curate(df, cfg)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_curate_swaps_in_redacted_text(spark):
    df = spark.createDataFrame(
        [(1, "contact me at alice@example.com about the training data run")],
        "doc_id long, text string",
    )
    out = curate(df, CurateConfig(langs=None, min_tokens=3)).collect()[0]
    assert "<EMAIL>" in out["text"]
    assert "alice@example.com" not in out["text"]


def test_sampling_is_deterministic_and_salted(docs):
    cfg_a = CurateConfig(sample_rate=0.3, sample_salt="train")
    cfg_b = CurateConfig(sample_rate=0.3, sample_salt="val")
    a1 = set(r["doc_id"] for r in curate(docs, cfg_a).collect())
    a2 = set(r["doc_id"] for r in curate(docs, cfg_a).collect())
    b = set(r["doc_id"] for r in curate(docs, cfg_b).collect())
    assert a1 == a2  # pure function of the key
    assert a1 != b  # independent splits per salt


def test_extra_gates(docs):
    base = funnel(annotate(docs, CurateConfig())).collect()[0]
    gated = funnel(
        annotate(docs, CurateConfig(extra_gates=("n_tokens >= 12",)))
    ).collect()[0]
    assert gated["n_quality"] < base["n_quality"]
    assert gated["n_kept"] <= base["n_kept"]


def test_one_pass_plan(docs):
    # the whole funnel must plan exactly ONE exchange (the fingerprint
    # window for dedup) — every gate is map-side
    flagged = annotate(docs, CurateConfig(sample_rate=0.5))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        flagged.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("Exchange") == 1
