"""Structured (non-analyzed) leaf queries — range / exists — and the
constant_score wrapper (host RangeQueryBuilder / ExistsQueryBuilder /
ConstantScoreQuery semantics over corpus columns)."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import (
    BoolSpec,
    ConstantScoreSpec,
    Engine,
    spec_from_json,
)
from neural_search_spark.index.build import doc_id_col
from neural_search_spark.query.neural import QuerySpec, execute


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    # null out tool='none' so `exists` has real missing values to skip
    return (
        transcripts_df.withColumn("doc_id", doc_id_col())
        .withColumn(
            "tool",
            F.when(F.col("tool") == "none", F.lit(None)).otherwise(
                F.col("tool")
            ),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def corpus_pd(corpus):
    return corpus.select("doc_id", "turn_idx", "role", "tool", "ts").toPandas()


def ids(df):
    return sorted(int(r.doc_id) for r in df.select("doc_id").collect())


def test_range_int_bounds(corpus, corpus_pd):
    out = execute(
        QuerySpec(query_type="range", field="turn_idx", gte=3, lt=9, boost=2.0),
        corpus,
    )
    rows = out.collect()
    want = corpus_pd[(corpus_pd.turn_idx >= 3) & (corpus_pd.turn_idx < 9)]
    assert ids(out) == sorted(int(x) for x in want.doc_id)
    assert all(r.score == 2.0 for r in rows)


def test_range_exclusive_and_open_ended(corpus, corpus_pd):
    gt = execute(QuerySpec(query_type="range", field="turn_idx", gt=9), corpus)
    want = corpus_pd[corpus_pd.turn_idx > 9]
    assert ids(gt) == sorted(int(x) for x in want.doc_id)


def test_range_timestamp_iso_string(corpus, corpus_pd):
    # an ISO string bound against the timestamp column: cast at plan time
    cut = corpus_pd.ts.quantile(0.5)
    iso = cut.strftime("%Y-%m-%d %H:%M:%S")
    out = execute(QuerySpec(query_type="range", field="ts", lte=iso), corpus)
    want = corpus_pd[corpus_pd.ts <= iso]
    assert ids(out) == sorted(int(x) for x in want.doc_id)


def test_range_string_field(corpus, corpus_pd):
    out = execute(
        QuerySpec(query_type="range", field="role", gte="tool"), corpus
    )
    want = corpus_pd[corpus_pd.role >= "tool"]
    assert ids(out) == sorted(int(x) for x in want.doc_id)


def test_range_validation(corpus):
    with pytest.raises(ValueError, match="at least one"):
        execute(QuerySpec(query_type="range", field="turn_idx"), corpus)
    with pytest.raises(ValueError, match="not in corpus"):
        execute(
            QuerySpec(query_type="range", field="nope", gte=1), corpus
        )


def test_exists(corpus, corpus_pd):
    out = execute(QuerySpec(query_type="exists", field="tool"), corpus)
    want = corpus_pd[corpus_pd.tool.notna()]
    assert ids(out) == sorted(int(x) for x in want.doc_id)
    assert 0 < len(want) < len(corpus_pd)  # nulls actually exercised
    with pytest.raises(ValueError, match="not in corpus"):
        execute(QuerySpec(query_type="exists", field="nope"), corpus)


def test_constant_score_sql_predicate(spark, corpus, corpus_pd):
    eng = Engine(spark, corpus=corpus)
    out = eng._constant_score_scored(
        ConstantScoreSpec(filter="role = 'user' AND turn_idx < 2", boost=3.5)
    )
    want = corpus_pd[(corpus_pd.role == "user") & (corpus_pd.turn_idx < 2)]
    assert ids(out) == sorted(int(x) for x in want.doc_id)
    assert all(r.score == 3.5 for r in out.collect())


def test_constant_score_wrapped_query_discards_scores(spark, corpus):
    eng = Engine(spark, corpus=corpus)
    sub = QuerySpec(query_type="match", query_text="the model")
    scored = execute(sub, corpus)
    out = eng._constant_score_scored(ConstantScoreSpec(filter=sub, boost=1.0))
    assert ids(out) == ids(scored)  # same membership
    assert {r.score for r in out.collect()} == {1.0}  # scores replaced


def test_json_shapes():
    s = spec_from_json({"range": {"turn_idx": {"gte": 3, "lt": 9}}})
    assert (s.query_type, s.field, s.gte, s.lt) == ("range", "turn_idx", 3, 9)
    s2 = spec_from_json({"range": {"field": "ts", "gt": "2001-01-01"}})
    assert (s2.field, s2.gt) == ("ts", "2001-01-01")
    e = spec_from_json({"exists": {"field": "tool"}})
    assert (e.query_type, e.field) == ("exists", "tool")
    c = spec_from_json(
        {"constant_score": {"filter": {"term": {"value": "spark"}},
                            "boost": 2.0}}
    )
    assert isinstance(c, ConstantScoreSpec) and c.boost == 2.0
    assert c.filter.query_type == "term"
    c2 = spec_from_json({"constant_score": {"filter": "role = 'user'"}})
    assert c2.filter == "role = 'user'" and c2.boost == 1.0
    with pytest.raises(ValueError, match="filter"):
        spec_from_json({"constant_score": {"boost": 2.0}})
    with pytest.raises(ValueError, match="nest"):
        spec_from_json(
            {"constant_score": {"filter": {"bool": {"must": []}}}}
        )
    with pytest.raises(ValueError, match="bounds"):
        spec_from_json({"range": {"turn_idx": 5}})


def test_engine_search_end_to_end(spark, corpus, corpus_pd):
    eng = Engine(spark, corpus=corpus)
    out = eng.search(
        {"range": {"turn_idx": {"gte": 30}}}, k=5
    ).collect()
    want = sorted(
        int(x) for x in corpus_pd[corpus_pd.turn_idx >= 30].doc_id
    )[:5]
    assert [int(r.doc_id) for r in out] == want  # boost ties → doc_id asc
    assert [r.rank for r in out] == list(range(1, len(out) + 1))

    cs = eng.search(
        {"constant_score": {"filter": "turn_idx >= 30", "boost": 2.0}}, k=5
    ).collect()
    assert [int(r.doc_id) for r in cs] == want
    assert all(r.score == 2.0 for r in cs)


def test_bool_with_range_clauses(spark, corpus, corpus_pd):
    """range/exists compose as bool clauses: scoring in must (adds
    boost), gating in the filter list."""
    eng = Engine(spark, corpus=corpus)
    spec = BoolSpec(
        must=[QuerySpec(query_type="match", query_text="model")],
        filter=[
            QuerySpec(query_type="range", field="turn_idx", lt=4),
            QuerySpec(query_type="exists", field="tool"),
        ],
    )
    out = eng._bool_scored(spec)
    got = ids(out)
    m = execute(
        QuerySpec(query_type="match", query_text="model"), corpus
    )
    allowed = corpus_pd[(corpus_pd.turn_idx < 4) & corpus_pd.tool.notna()]
    want = sorted(set(ids(m)) & set(int(x) for x in allowed.doc_id))
    assert got == want

    # as a must clause it contributes its boost to the score sum
    spec2 = BoolSpec(
        must=[
            QuerySpec(query_type="match", query_text="model"),
            QuerySpec(query_type="range", field="turn_idx", lt=4, boost=7.0),
        ]
    )
    out2 = {int(r.doc_id): r.score for r in eng._bool_scored(spec2).collect()}
    base = {int(r.doc_id): r.score for r in m.collect()}
    for d, s in out2.items():
        assert abs(s - (base[d] + 7.0)) < 1e-9


def test_explain_route(spark, corpus):
    eng = Engine(spark, corpus=corpus)
    assert eng.explain_route({"range": {"turn_idx": {"gte": 1}}})["route"] == "corpus"
    assert eng.explain_route({"exists": {"field": "tool"}})["route"] == "corpus"
    r = eng.explain_route(
        {"constant_score": {"filter": "role = 'user'"}}
    )
    assert r["route"] == "corpus" and "pushed-down" in r["reason"]
    r2 = eng.explain_route(
        {"constant_score": {"filter": {"match": {"query_text": "spark"}}}}
    )
    assert r2["route"] == "composite"


# --------------------------------------------------------------------------
# distance_feature (host DistanceFeatureQueryBuilder → Lucene
# LongPoint.newDistanceFeatureQuery: boost × pivot / (pivot + |v − origin|))
# --------------------------------------------------------------------------
def test_distance_feature_numeric(corpus, corpus_pd):
    got = execute(
        QuerySpec(
            query_type="distance_feature",
            field="turn_idx",
            origin=3,
            df_pivot=2,
            boost=1.5,
        ),
        corpus,
    ).toPandas().set_index("doc_id")["score"]
    exp = 1.5 * 2.0 / (2.0 + (corpus_pd.set_index("doc_id")["turn_idx"] - 3).abs())
    assert len(got) == len(exp)
    for d, s in exp.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_distance_feature_timestamp_iso_origin_duration_pivot(corpus, corpus_pd):
    origin = corpus_pd["ts"].min()
    got = execute(
        QuerySpec(
            query_type="distance_feature",
            field="ts",
            origin=origin.isoformat(sep=" "),
            df_pivot="2h",
        ),
        corpus,
    ).toPandas().set_index("doc_id")["score"]
    secs = (corpus_pd.set_index("doc_id")["ts"] - origin).dt.total_seconds()
    exp = 7200.0 / (7200.0 + secs.abs())
    for d, s in exp.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_distance_feature_null_field_never_matches(spark, corpus):
    nullable = corpus.withColumn(
        "ti2",
        F.when(F.col("turn_idx") % 5 == 0, F.lit(None)).otherwise(
            F.col("turn_idx")
        ),
    )
    got = execute(
        QuerySpec(
            query_type="distance_feature", field="ti2", origin=0, df_pivot=1
        ),
        nullable,
    )
    n_nonnull = nullable.filter(F.col("ti2").isNotNull()).count()
    assert got.count() == n_nonnull


def test_distance_feature_validation(corpus):
    with pytest.raises(ValueError, match="positive"):
        execute(
            QuerySpec(
                query_type="distance_feature",
                field="turn_idx",
                origin=0,
                df_pivot=0,
            ),
            corpus,
        )
    with pytest.raises(ValueError, match="duration"):
        execute(
            QuerySpec(
                query_type="distance_feature",
                field="turn_idx",
                origin=0,
                df_pivot="7 parsecs",
            ),
            corpus,
        )
    with pytest.raises(ValueError, match="origin and pivot"):
        execute(
            QuerySpec(query_type="distance_feature", field="turn_idx"),
            corpus,
        )


def test_distance_feature_json_shape():
    spec = spec_from_json(
        {"distance_feature": {"field": "ts", "origin": "2026-01-01",
                              "pivot": "7d", "boost": 2.0}}
    )
    assert spec.query_type == "distance_feature"
    assert spec.origin == "2026-01-01"
    assert spec.df_pivot == "7d"
    assert spec.boost == 2.0


# --------------------------------------------------------------------------
# wrapper (base64-encoded query) + match_none
# --------------------------------------------------------------------------
def test_wrapper_decodes_to_inner_query(spark, corpus, corpus_pd):
    import base64
    import json as _json

    inner = {"range": {"turn_idx": {"gte": 3, "lt": 9}}}
    spec = spec_from_json(
        {
            "wrapper": {
                "query": base64.b64encode(
                    _json.dumps(inner).encode()
                ).decode()
            }
        }
    )
    direct = spec_from_json(inner)
    got = ids(execute(spec, corpus))
    assert got == ids(execute(direct, corpus))
    assert got  # non-degenerate
    with pytest.raises(ValueError, match="base64"):
        spec_from_json({"wrapper": {"query": "!!not-base64!!"}})


def test_match_none(spark, corpus):
    spec = spec_from_json({"match_none": {}})
    assert execute(spec, corpus).count() == 0
    # composes in bool without killing siblings (pure-should, msm=1)
    from neural_search_spark.engine import BoolSpec, Engine

    eng = Engine(spark, corpus=corpus)
    b = BoolSpec(
        should=[spec_from_json({"match_all": {}}), spec],
        minimum_should_match=1,
    )
    assert eng._bool_scored(b).count() == corpus.count()
