"""BoolSpec (Lucene BooleanQuery composition — host behavior the
reference's hybrid branches carry): must sums and requires, should adds
optionally with minimum_should_match counting, must_not excludes without
scoring, filter gates without scoring, and scores always come from
FULL-corpus stats (gates never move surviving scores)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import BoolSpec, Engine, spec_from_json
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.neural import QuerySpec, execute


def _match(text):
    return QuerySpec(query_type="match", query_text=text)


@pytest.fixture(scope="module")
def bool_setup(spark, transcripts_df):
    docs = transcripts_df.withColumn("doc_id", doc_id_col())
    eng = Engine(spark, corpus=docs)
    # per-clause full matched sets, the pandas ground truth
    clause = {
        t: execute(_match(t), docs).toPandas().set_index("doc_id")["score"]
        for t in ("tool call", "model", "the")
    }
    return eng, clause


def _pd_bool(clause, must=(), should=(), must_not=(), msm=None):
    msm = (0 if must else 1) if msm is None else msm
    all_ids = set()
    for t in list(must) + list(should):
        all_ids |= set(clause[t].index)
    rows = []
    for d in all_ids:
        m = [clause[t].get(d) for t in must]
        if any(v is None or np.isnan(v) for v in m):
            continue
        s = [clause[t].get(d) for t in should]
        s = [v for v in s if v is not None and not np.isnan(v)]
        if len(s) < msm:
            continue
        if any(d in clause[t].index for t in must_not):
            continue
        rows.append((d, sum(m) + sum(s)))
    return (
        pd.DataFrame(rows, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )


def _run(eng, spec, k=15):
    return eng.search(spec, k=k).toPandas()


def _check(got, exp, k=15):
    exp = exp.head(k)
    assert len(got) == len(exp)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()
    assert np.allclose(got.score, exp.score, rtol=1e-9)


def test_must_sums_and_requires(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(must=[_match("tool call"), _match("model")])
    _check(_run(eng, spec), _pd_bool(clause, must=("tool call", "model")))


def test_should_is_optional_with_must(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(must=[_match("tool call")], should=[_match("model")])
    _check(
        _run(eng, spec),
        _pd_bool(clause, must=("tool call",), should=("model",)),
    )


def test_pure_should_defaults_msm_1(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(should=[_match("tool call"), _match("model")])
    _check(
        _run(eng, spec), _pd_bool(clause, should=("tool call", "model"))
    )


def test_minimum_should_match_counts(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(
        should=[_match("tool call"), _match("model"), _match("the")],
        minimum_should_match=2,
    )
    _check(
        _run(eng, spec),
        _pd_bool(clause, should=("tool call", "model", "the"), msm=2),
    )


def test_must_not_excludes_without_scoring(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(must=[_match("the")], must_not=[_match("model")])
    exp = _pd_bool(clause, must=("the",), must_not=("model",))
    got = _run(eng, spec)
    _check(got, exp)
    # surviving scores equal the plain must scores (gate didn't move them)
    plain = _pd_bool(clause, must=("the",))
    merged = got.merge(plain, on="doc_id", suffixes=("", "_plain"))
    assert np.allclose(merged.score, merged.score_plain, rtol=1e-9)


def test_filter_predicate_gates_without_scoring(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(must=[_match("the")], filter="turn_idx % 2 = 0")
    got = _run(eng, spec, k=30)
    plain = _pd_bool(clause, must=("the",))
    # every returned doc scores exactly its unfiltered score
    m = got.merge(plain, on="doc_id", suffixes=("", "_plain"))
    assert len(m) == len(got)
    assert np.allclose(m.score, m.score_plain, rtol=1e-9)


def test_filter_subquery_list(bool_setup):
    eng, clause = bool_setup
    spec = BoolSpec(must=[_match("the")], filter=[_match("model")])
    got = _run(eng, spec, k=30)
    allowed = set(clause["model"].index)
    assert set(got.doc_id).issubset(allowed)
    plain = _pd_bool(clause, must=("the",))
    exp = plain[plain.doc_id.isin(allowed)].head(30)
    assert (got.doc_id.to_numpy() == exp.doc_id.to_numpy()).all()


def test_bool_requires_scoring_clause(bool_setup):
    eng, _ = bool_setup
    with pytest.raises(ValueError, match="scoring clause"):
        eng.search(BoolSpec(must_not=[_match("the")]), k=5)


def test_spec_from_json_bool_and_nesting():
    s = spec_from_json(
        {
            "bool": {
                "must": [{"match": {"query_text": "a"}}],
                "should": [{"match_phrase": {"query_text": "b c"}}],
                "minimum_should_match": 1,
            }
        }
    )
    assert isinstance(s, BoolSpec)
    assert s.should[0].query_type == "match_phrase"
    # bool nests under bool (Lucene BooleanQuery nests arbitrarily) ...
    s2 = spec_from_json(
        {
            "bool": {
                "must": [
                    {"bool": {"should": [{"match": {"query_text": "a"}}]}}
                ]
            }
        }
    )
    assert isinstance(s2.must[0], BoolSpec)
    # ... but other composites still can't
    with pytest.raises(ValueError, match="leaves or nested bool"):
        spec_from_json(
            {
                "bool": {
                    "must": [
                        {"hybrid": {"queries": [{"match": {"query_text": "a"}}]}}
                    ]
                }
            }
        )


def test_nested_bool_scores_like_manual_composition(bool_setup):
    eng, clause = bool_setup
    # (must: "tool call") AND (should>=1 of {"model", "the"} as a nested
    # bool whose score is the sum of its matching shoulds)
    inner = BoolSpec(should=[_match("model"), _match("the")])
    outer = BoolSpec(must=[_match("tool call"), inner])
    got = _run(eng, outer)

    # pandas oracle: inner = pure-should bool (msm defaults to 1)
    inner_pd = _pd_bool(clause, should=("model", "the"))
    inner_s = inner_pd.set_index("doc_id")["score"]
    outer_ids = set(clause["tool call"].index) & set(inner_s.index)
    rows = [
        (d, clause["tool call"][d] + inner_s[d]) for d in outer_ids
    ]
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    _check(got, exp)


def test_nested_bool_in_must_not_and_filter(bool_setup):
    eng, clause = bool_setup
    # must_not: docs matching BOTH "model" and "the" (nested must-bool)
    inner = BoolSpec(must=[_match("model"), _match("the")])
    got = _run(eng, BoolSpec(must=[_match("tool call")], must_not=[inner]))
    both = set(clause["model"].index) & set(clause["the"].index)
    keep = [
        (d, clause["tool call"][d])
        for d in clause["tool call"].index
        if d not in both
    ]
    exp = (
        pd.DataFrame(keep, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    _check(got, exp)
    # same nested bool as a filter clause: gates to `both`, scores
    # unchanged (full-corpus stats contract)
    got_f = _run(eng, BoolSpec(must=[_match("tool call")], filter=[inner]))
    keep_f = [
        (d, clause["tool call"][d])
        for d in clause["tool call"].index
        if d in both
    ]
    exp_f = (
        pd.DataFrame(keep_f, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    _check(got_f, exp_f)


def test_bool_inside_hybrid(bool_setup):
    eng, _ = bool_setup
    spec = spec_from_json(
        {
            "hybrid": {
                "queries": [
                    {"match": {"query_text": "tool call"}},
                    {
                        "bool": {
                            "must": [{"match": {"query_text": "the"}}],
                            "must_not": [{"match": {"query_text": "model"}}],
                        }
                    },
                ],
                "pagination_depth": 50,
            }
        }
    )
    out = eng.search(spec, k=10).toPandas()
    assert len(out) == 10
    assert list(out["rank"]) == list(range(1, 11))
