"""function_score query — parity against pandas-computed expectations
(host FunctionScoreQuery: functions list, score_mode, boost_mode,
max_boost, min_score)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import Engine, spec_from_json
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.function_score import (
    FunctionScoreSpec,
    ScoreFunction,
    functions_from_json,
    parse_duration_seconds,
)
from neural_search_spark.query.neural import QuerySpec, execute


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    return (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .withColumn("n_toks", F.size(F.split(F.col("text"), " ")))
        .cache()
    )


@pytest.fixture(scope="module")
def corpus_pd(corpus):
    return (
        corpus.select("doc_id", "turn_idx", "role", "n_toks", "ts")
        .toPandas()
        .set_index("doc_id")
    )


@pytest.fixture(scope="module")
def eng(spark, corpus):
    return Engine(spark, corpus=corpus)


@pytest.fixture(scope="module")
def base_scores(corpus):
    out = execute(QuerySpec(query_type="match", query_text="the model"), corpus)
    return {int(r.doc_id): r.score for r in out.collect()}


def fscore(eng, **kw):
    spec = FunctionScoreSpec(
        query=QuerySpec(query_type="match", query_text="the model"), **kw
    )
    return {
        int(r.doc_id): r.score
        for r in eng._function_score_scored(spec).collect()
    }


def test_no_functions_is_boosted_passthrough(eng, base_scores):
    got = fscore(eng, boost=2.0)
    assert set(got) == set(base_scores)
    for d, s in got.items():
        assert abs(s - 2.0 * base_scores[d]) < 1e-9


def test_field_value_factor_modifiers(eng, base_scores, corpus_pd):
    for mod, f in [
        ("log1p", lambda x: math.log10(1 + x)),
        ("sqrt", math.sqrt),
        ("square", lambda x: x * x),
        ("ln2p", lambda x: math.log(2 + x)),
        ("reciprocal", lambda x: 1.0 / x),
        ("none", lambda x: x),
    ]:
        got = fscore(
            eng,
            functions=[
                ScoreFunction(
                    "field_value_factor",
                    {"field": "n_toks", "factor": 0.5, "modifier": mod},
                )
            ],
        )
        for d, s in got.items():
            want = base_scores[d] * f(0.5 * corpus_pd.loc[d, "n_toks"])
            assert abs(s - want) < 1e-6 * max(1, abs(want)), (mod, d)


def test_filter_and_weight(eng, base_scores, corpus_pd):
    got = fscore(
        eng,
        functions=[
            ScoreFunction("weight", {}, filter="role = 'user'", weight=3.0)
        ],
    )
    for d, s in got.items():
        mult = 3.0 if corpus_pd.loc[d, "role"] == "user" else 1.0
        assert abs(s - base_scores[d] * mult) < 1e-9


def test_score_modes(eng, base_scores, corpus_pd):
    fns = [
        ScoreFunction("weight", {}, filter="role = 'user'", weight=2.0),
        ScoreFunction("weight", {}, weight=5.0),
    ]

    def vals(d):
        out = []
        if corpus_pd.loc[d, "role"] == "user":
            out.append(2.0)
        out.append(5.0)
        return out

    expect = {
        "multiply": lambda v: np.prod(v),
        "sum": lambda v: np.sum(v),
        "avg": lambda v: np.mean(v),
        "first": lambda v: v[0],
        "max": lambda v: np.max(v),
        "min": lambda v: np.min(v),
    }
    for mode, f in expect.items():
        got = fscore(eng, functions=fns, score_mode=mode)
        for d, s in got.items():
            want = base_scores[d] * f(vals(d))
            assert abs(s - want) < 1e-9, (mode, d)


def test_boost_modes(eng, base_scores):
    fns = [ScoreFunction("weight", {}, weight=4.0)]
    expect = {
        "multiply": lambda q: q * 4.0,
        "replace": lambda q: 4.0,
        "sum": lambda q: q + 4.0,
        "avg": lambda q: (q + 4.0) / 2.0,
        "max": lambda q: max(q, 4.0),
        "min": lambda q: min(q, 4.0),
    }
    for mode, f in expect.items():
        got = fscore(eng, functions=fns, boost_mode=mode)
        for d, s in got.items():
            assert abs(s - f(base_scores[d])) < 1e-9, (mode, d)


def test_max_boost_and_min_score(eng, base_scores):
    got = fscore(
        eng,
        functions=[ScoreFunction("weight", {}, weight=100.0)],
        max_boost=2.0,
    )
    for d, s in got.items():
        assert abs(s - base_scores[d] * 2.0) < 1e-9
    hi = max(base_scores.values())
    got2 = fscore(eng, min_score=hi)
    assert all(s >= hi for s in got2.values())
    assert len(got2) < len(base_scores)


def test_decay_numeric_gauss_exp_linear(eng, base_scores, corpus_pd):
    body = {"turn_idx": {"origin": 0, "scale": 10, "offset": 2,
                         "decay": 0.5}}
    for kind in ("gauss", "exp", "linear"):
        got = fscore(eng, functions=[ScoreFunction(kind, dict(body))])
        for d, s in got.items():
            x = corpus_pd.loc[d, "turn_idx"]
            dd = max(0.0, abs(x - 0) - 2)
            if kind == "gauss":
                sigma2 = -(10.0**2) / (2 * math.log(0.5))
                v = math.exp(-(dd * dd) / (2 * sigma2))
            elif kind == "exp":
                v = math.exp(dd * math.log(0.5) / 10.0)
            else:
                sc = 10.0 / 0.5
                v = max(0.0, (sc - dd) / sc)
            assert abs(s - base_scores[d] * v) < 1e-9, (kind, d)


def test_decay_timestamp_durations(eng, base_scores, corpus_pd):
    origin = corpus_pd.ts.max()
    iso = origin.strftime("%Y-%m-%d %H:%M:%S")
    got = fscore(
        eng,
        functions=[
            ScoreFunction(
                "gauss",
                {"ts": {"origin": iso, "scale": "30d", "decay": 0.5}},
            )
        ],
    )
    assert parse_duration_seconds("30d") == 30 * 86400
    sigma2 = -((30 * 86400.0) ** 2) / (2 * math.log(0.5))
    for d, s in got.items():
        dd = abs((corpus_pd.loc[d, "ts"] - origin).total_seconds())
        v = math.exp(-(dd * dd) / (2 * sigma2))
        assert abs(s - base_scores[d] * v) < 1e-6 * max(1, abs(s))


def test_random_score_deterministic(eng):
    a = fscore(
        eng,
        functions=[ScoreFunction("random_score", {"seed": 42})],
        boost_mode="replace",
    )
    b = fscore(
        eng,
        functions=[ScoreFunction("random_score", {"seed": 42})],
        boost_mode="replace",
    )
    c = fscore(
        eng,
        functions=[ScoreFunction("random_score", {"seed": 7})],
        boost_mode="replace",
    )
    assert a == b  # same seed → identical
    assert a != c  # different seed → different draw
    assert all(0.0 <= v < 1.0 for v in a.values())


def test_script_score_expr(eng, base_scores, corpus_pd):
    got = fscore(
        eng,
        functions=[
            ScoreFunction("script_score", {"expr": "sqrt(n_toks) + turn_idx"})
        ],
    )
    for d, s in got.items():
        row = corpus_pd.loc[d]
        want = base_scores[d] * (math.sqrt(row.n_toks) + row.turn_idx)
        assert abs(s - want) < 1e-6 * max(1, abs(want))


def test_json_parse_and_search(eng, base_scores, corpus_pd):
    spec = spec_from_json(
        {
            "function_score": {
                "query": {"match": {"query_text": "the model"}},
                "functions": [
                    {"filter": "role = 'user'", "weight": 2.0},
                    {
                        "field_value_factor": {
                            "field": "n_toks",
                            "modifier": "log1p",
                        }
                    },
                ],
                "score_mode": "sum",
                "boost_mode": "multiply",
            }
        }
    )
    assert isinstance(spec, FunctionScoreSpec)
    out = eng.search(spec, k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # top-1 matches the brute-force best
    best = None
    for d, q in base_scores.items():
        row = corpus_pd.loc[d]
        v = (2.0 if row.role == "user" else 0.0) + math.log10(1 + row.n_toks)
        sc = q * v
        if best is None or sc > best[1] or (sc == best[1] and d < best[0]):
            best = (d, sc)
    assert int(out[0].doc_id) == best[0]
    assert abs(out[0].score - best[1]) < 1e-9


def test_default_query_is_match_all(eng, corpus_pd):
    got = {
        int(r.doc_id): r.score
        for r in eng._function_score_scored(
            FunctionScoreSpec(
                functions=[
                    ScoreFunction(
                        "field_value_factor", {"field": "turn_idx"}
                    )
                ]
            )
        ).collect()
    }
    assert len(got) == len(corpus_pd)
    for d, s in got.items():
        assert abs(s - corpus_pd.loc[d, "turn_idx"]) < 1e-9


def test_functions_from_json_validation():
    with pytest.raises(ValueError, match="one function kind"):
        functions_from_json(
            [{"gauss": {}, "random_score": {}}]
        )
    with pytest.raises(ValueError, match="needs a function"):
        functions_from_json([{}])
    with pytest.raises(ValueError, match="unknown score function"):
        functions_from_json([{"nope": {}}])
    with pytest.raises(ValueError, match="SQL predicate"):
        functions_from_json([{"filter": {"match": {}}, "weight": 1.0}])


def test_validation_errors(eng):
    with pytest.raises(ValueError, match="score_mode"):
        fscore(eng, functions=[ScoreFunction("weight", {}, weight=1.0)],
               score_mode="nope")
    with pytest.raises(ValueError, match="boost_mode"):
        fscore(eng, functions=[ScoreFunction("weight", {}, weight=1.0)],
               boost_mode="nope")
    with pytest.raises(ValueError, match="not in corpus"):
        fscore(eng, functions=[
            ScoreFunction("field_value_factor", {"field": "nope"})])
    with pytest.raises(ValueError, match="exactly one field"):
        fscore(eng, functions=[ScoreFunction("gauss", {})])
    with pytest.raises(ValueError, match="decay must be"):
        fscore(eng, functions=[ScoreFunction(
            "gauss", {"turn_idx": {"origin": 0, "scale": 5, "decay": 1.5}})])
    with pytest.raises(ValueError, match="hybrid"):
        spec_from_json({"function_score": {
            "query": {"hybrid": {"queries": [
                {"match": {"query_text": "x"}}]}}}})


def test_explain_route(eng):
    r = eng.explain_route(
        {
            "function_score": {
                "query": {"match": {"query_text": "the"}},
                "functions": [{"weight": 2.0}],
            }
        }
    )
    assert r["route"] == "composite"
    assert r["query"]["route"] in ("index", "corpus")


# --------------------------------------------------------------------------
# standalone script_score query (host ScriptScoreQueryBuilder): the script
# REPLACES the wrapped query's score; `_score` binds the query score
# --------------------------------------------------------------------------
def test_script_score_standalone_replaces(eng, base_scores):
    from neural_search_spark.engine import spec_from_json

    spec = spec_from_json(
        {
            "script_score": {
                "query": {"match": {"query_text": "the model"}},
                "script": {"source": "ln(1 + _score) + 0.1 * n_toks"},
            }
        }
    )
    got = {
        r["doc_id"]: r["score"]
        for r in eng._function_score_scored(spec).collect()
    }
    import math

    n_toks = {
        r["doc_id"]: r["n_toks"]
        for r in eng.corpus.select("doc_id", "n_toks").collect()
    }
    assert len(got) == len(base_scores)
    for d, s in base_scores.items():
        assert got[d] == pytest.approx(
            math.log(1 + s) + 0.1 * n_toks[d], rel=1e-9
        )


def test_script_score_boost_and_min_score(eng, base_scores):
    from neural_search_spark.engine import spec_from_json

    spec = spec_from_json(
        {
            "script_score": {
                "query": {"match": {"query_text": "the model"}},
                "script": "_score",
                "boost": 2.0,
                "min_score": 1.0,
            }
        }
    )
    got = {r["doc_id"]: r["score"] for r in eng._function_score_scored(spec).collect()}
    exp = {d: 2.0 * s for d, s in base_scores.items() if 2.0 * s >= 1.0}
    assert got.keys() == exp.keys()
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)


def test_script_score_validation():
    from neural_search_spark.engine import spec_from_json

    with pytest.raises(ValueError, match="query and script"):
        spec_from_json({"script_score": {"script": "_score"}})
    with pytest.raises(ValueError, match="hybrid"):
        spec_from_json(
            {
                "script_score": {
                    "query": {"hybrid": {"queries": [
                        {"match": {"query_text": "a"}}]}},
                    "script": "_score",
                }
            }
        )
