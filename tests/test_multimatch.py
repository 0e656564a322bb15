"""multi_match (OpenSearch host behavior the reference's hybrid branches
carry): per-field BM25 with per-field statistics, "name^boost" boosts,
best_fields = DisjunctionMaxQuery (max + tie_breaker·(sum−max)),
most_fields = bool-should sum."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.neural import (
    QuerySpec,
    execute,
    multi_match_scored,
)

Q = "tool c0001"


@pytest.fixture(scope="module")
def mm_docs(spark, transcripts_df):
    # two text-ish fields with different vocabularies: text + conv_id
    return transcripts_df.withColumn("doc_id", doc_id_col()).select(
        "doc_id", "text", F.col("conv_id").alias("tag")
    )


@pytest.fixture(scope="module")
def per_field(mm_docs):
    out = {}
    for f in ("text", "tag"):
        df = mm_docs.select("doc_id", F.col(f).alias("text"))
        out[f] = (
            execute(QuerySpec(query_type="match", query_text=Q), df)
            .toPandas()
            .set_index("doc_id")["score"]
        )
    return out


def _pd_mm(per_field, boosts, match_type, tb):
    ids = set()
    for f in boosts:
        ids |= set(per_field[f].index)
    rows = []
    for d in ids:
        vals = [
            per_field[f].get(d, np.nan) * b
            for f, b in boosts.items()
        ]
        vals = [v for v in vals if not np.isnan(v)]
        s = (
            sum(vals)
            if match_type == "most_fields"
            else max(vals) + tb * (sum(vals) - max(vals))
        )
        rows.append((d, s))
    return (
        pd.DataFrame(rows, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "match_type,tb", [("best_fields", 0.0), ("best_fields", 0.4), ("most_fields", 0.0)]
)
def test_multi_match_combines(mm_docs, per_field, match_type, tb):
    got = (
        multi_match_scored(
            mm_docs, Q, ["text", "tag^2.5"], match_type=match_type, tie_breaker=tb
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(15)
        .toPandas()
    )
    exp = _pd_mm(
        per_field, {"text": 1.0, "tag": 2.5}, match_type, tb
    ).head(15)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert np.allclose(got.score, exp.score, rtol=1e-9)


def _pd_dismax(parts, tb):
    """parts: list of pandas Series (doc_id-indexed scores, boost already
    applied) → combined dis-max frame sorted score desc, doc_id asc."""
    import pandas as pd

    df = pd.concat(parts, axis=1)
    mx, sm = df.max(axis=1), df.sum(axis=1)
    out = (mx + tb * (sm - mx)).rename("score").reset_index()
    return out.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)


@pytest.mark.parametrize("mt", ["phrase", "phrase_prefix", "bool_prefix"])
def test_multi_match_phrase_family(mm_docs, mt):
    """The field-centric phrase family: each field runs its own sub-query
    (match_phrase / match_phrase_prefix / match_bool_prefix), dis-max +
    tie_breaker combine — checked against a manual per-field composition."""
    from neural_search_spark.query.phrase import (
        phrase_prefix_scored_scan,
        phrase_scored_scan,
    )
    from neural_search_spark.query.sqs import sqs_scored
    from neural_search_spark.tokenizer import tokenize_py

    row = mm_docs.orderBy("doc_id").limit(1).toPandas().iloc[0]
    tk = tokenize_py(row.text)
    q = f"{tk[0]} {tk[1]}"
    tb = 0.3

    def scorer(scoped):
        if mt == "phrase":
            return phrase_scored_scan(scoped, q)
        if mt == "phrase_prefix":
            return phrase_prefix_scored_scan(scoped, q)
        return sqs_scored(scoped, f"{tk[0]} {tk[1]}*")

    parts = []
    for f, b in (("text", 1.0), ("tag", 2.0)):
        scoped = mm_docs.select("doc_id", F.col(f).alias("text"))
        s = scorer(scoped).toPandas().set_index("doc_id")["score"] * b
        parts.append(s.rename(f))
    exp = _pd_dismax(parts, tb)
    assert len(exp) > 0, "query must match at least one doc"
    got = (
        multi_match_scored(
            mm_docs, q, ["text", "tag^2.0"], match_type=mt, tie_breaker=tb
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .toPandas()
    )
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert np.allclose(got.score, exp.score, rtol=1e-9)


def test_multi_match_phrase_slop_via_engine(spark):
    """type=phrase carries slop through the engine spec."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "t1"), (2, "alpha gamma beta", "t2")],
        "doc_id long, text string, tag string",
    )
    q = "alpha gamma"  # adjacent only in doc 2; doc 1 needs slop ≥ 1
    eng = Engine(spark, corpus=docs)
    mk = lambda slop: spec_from_json(
        {
            "multi_match": {
                "query_text": q,
                "fields": ["text", "tag"],
                "match_type": "phrase",
                "slop": slop,
            }
        }
    )
    assert set(eng.search(mk(0), k=5).toPandas().doc_id) == {2}
    assert set(eng.search(mk(1), k=5).toPandas().doc_id) == {1, 2}


def test_multi_match_validation(mm_docs):
    with pytest.raises(ValueError, match="best_fields"):
        multi_match_scored(mm_docs, Q, ["text"], match_type="bogus")
    with pytest.raises(ValueError, match="at least one field"):
        multi_match_scored(mm_docs, Q, [])


def test_engine_multi_match_spec(mm_docs, spark, per_field):
    eng = Engine(spark, corpus=mm_docs)
    spec = spec_from_json(
        {
            "multi_match": {
                "query_text": Q,
                "fields": ["text", "tag^2.5"],
                "match_type": "best_fields",
                "tie_breaker": 0.4,
            }
        }
    )
    got = eng.search(spec, k=10).toPandas()
    exp = _pd_mm(per_field, {"text": 1.0, "tag": 2.5}, "best_fields", 0.4).head(10)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert np.allclose(got.score, exp.score, rtol=1e-9)


def test_multi_match_inside_bool(mm_docs, spark):
    eng = Engine(spark, corpus=mm_docs)
    spec = spec_from_json(
        {
            "bool": {
                "must": [
                    {"multi_match": {"query_text": Q, "fields": ["text", "tag"]}}
                ],
                "must_not": [{"match": {"query_text": "model"}}],
            }
        }
    )
    out = eng.search(spec, k=10).toPandas()
    assert len(out) > 0
    excluded = (
        execute(QuerySpec(query_type="match", query_text="model"), mm_docs)
        .toPandas()["doc_id"]
    )
    assert not set(out.doc_id) & set(excluded)
