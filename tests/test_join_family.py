"""Join-family queries (has_child / has_parent / parent_id / nested):
score_mode math and count gates against independent pandas oracles over
the conv/turn hierarchy, plus the engine JSON surface and its guards."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.engine import (
    Engine,
    HasChildSpec,
    HasParentSpec,
    ParentIdSpec,
    QuerySpec,
    spec_from_json,
)

CHILD_Q = "tool call merge"


@pytest.fixture(scope="module")
def corpus(spark, transcripts_df):
    from neural_search_spark.index.build import doc_id_col

    return transcripts_df.withColumn("doc_id", doc_id_col()).persist()


@pytest.fixture(scope="module")
def eng(spark, corpus):
    return Engine(spark, corpus=corpus)


@pytest.fixture(scope="module")
def child_oracle(spark, eng, corpus):
    """(doc_id, conv_id, score) of the wrapped match query's full
    matched set, computed once via the (separately gated) corpus-scan
    scorer and joined to conv_id in pandas."""
    from neural_search_spark.query.neural import execute

    scored = execute(
        QuerySpec(query_type="match", query_text=CHILD_Q), corpus, "doc_id"
    ).toPandas()
    keys = corpus.select("doc_id", "conv_id").toPandas()
    return scored.merge(keys, on="doc_id")


def _expected_parents(child_oracle, mode, min_children=1, max_children=None):
    g = child_oracle.groupby("conv_id")["score"]
    agg = {
        "none": lambda s: 1.0,
        "min": lambda s: s.min(),
        "max": lambda s: s.max(),
        "sum": lambda s: s.sum(),
        "avg": lambda s: s.mean(),
    }[mode]
    out = {}
    for conv, s in g:
        n = len(s)
        if n < min_children or (max_children is not None and n > max_children):
            continue
        out[conv] = float(agg(s))
    return out


class TestHasChild:
    @pytest.mark.parametrize("mode", ["none", "min", "max", "sum", "avg"])
    def test_score_mode_matrix(self, eng, child_oracle, mode):
        exp = _expected_parents(child_oracle, mode)
        got = eng.search(
            HasChildSpec(
                query=QuerySpec(query_type="match", query_text=CHILD_Q),
                score_mode=mode,
            ),
            k=len(exp) + 5,
        ).collect()
        assert len(got) == len(exp)
        for r in got:
            assert r["score"] == pytest.approx(exp[r["conv_id"]], rel=1e-9)
        # rank = score desc, conv_id asc
        ranked = sorted(
            exp.items(), key=lambda kv: (-round(kv[1], 12), kv[0])
        )
        assert [r["conv_id"] for r in sorted(got, key=lambda r: r["rank"])] \
            == [c for c, _ in ranked]

    def test_count_gates(self, eng, child_oracle):
        exp = _expected_parents(
            child_oracle, "sum", min_children=2, max_children=4
        )
        got = eng.search(
            HasChildSpec(
                query=QuerySpec(query_type="match", query_text=CHILD_Q),
                score_mode="sum",
                min_children=2,
                max_children=4,
            ),
            k=len(exp) + 5,
        ).collect()
        assert {r["conv_id"] for r in got} == set(exp)
        for r in got:
            assert r["score"] == pytest.approx(exp[r["conv_id"]], rel=1e-9)

    def test_nested_json_defaults_avg(self, eng, child_oracle):
        spec = spec_from_json(
            {"nested": {"path": "turns",
                        "query": {"match": {"query_text": CHILD_Q}}}}
        )
        assert isinstance(spec, HasChildSpec)
        assert spec.score_mode == "avg"
        exp = _expected_parents(child_oracle, "avg")
        got = eng.search(spec, k=5).collect()
        ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [(r["conv_id"],) for r in got] == [(c,) for c, _ in ranked]

    def test_nested_bad_path_raises(self):
        with pytest.raises(ValueError, match="path must be 'turns'"):
            spec_from_json(
                {"nested": {"path": "blocks",
                            "query": {"match": {"query_text": "x"}}}}
            )

    def test_hybrid_subquery_rejected(self):
        with pytest.raises(ValueError, match="wraps leaf"):
            spec_from_json(
                {"has_child": {"query": {"hybrid": {"queries": [
                    {"match": {"query_text": "x"}}]}}}}
            )

    def test_msearch_rejects_parent_hits(self, eng):
        with pytest.raises(ValueError, match="parent hits"):
            eng.msearch(
                {"a": {"has_child": {
                    "query": {"match": {"query_text": "x"}}}}},
                k=5,
            )

    def test_bad_score_mode(self, eng):
        with pytest.raises(ValueError, match="score_mode"):
            eng.search(
                HasChildSpec(
                    query=QuerySpec(query_type="match", query_text="tool"),
                    score_mode="prod",
                ),
                k=5,
            )

    def test_missing_parent_key_raises(self, spark, corpus):
        bare = corpus.drop("conv_id")
        eng2 = Engine(spark, corpus=bare)
        with pytest.raises(ValueError, match="parent key"):
            eng2.search(
                HasChildSpec(
                    query=QuerySpec(query_type="match", query_text="tool")
                ),
                k=5,
            )


class TestInnerHits:
    def test_inner_hits_per_parent(self, eng, child_oracle):
        spec = spec_from_json(
            {"has_child": {"query": {"match": {"query_text": CHILD_Q}},
                           "score_mode": "sum",
                           "inner_hits": {"size": 2}}}
        )
        parents = eng.search(spec, k=4).collect()
        top = {r["conv_id"] for r in parents}
        ih = eng.search_inner_hits(spec, k=4).collect()
        assert {r["conv_id"] for r in ih} <= top
        # per parent: top-2 matching children by (score desc, doc_id asc)
        for conv in top:
            sub = child_oracle[child_oracle.conv_id == conv].sort_values(
                ["score", "doc_id"], ascending=[False, True]
            ).head(2)
            got = sorted(
                (r for r in ih if r["conv_id"] == conv),
                key=lambda r: r["child_rank"],
            )
            assert [r["doc_id"] for r in got] == list(sub.doc_id)
            for r, (_, o) in zip(got, sub.iterrows()):
                assert r["child_score"] == pytest.approx(
                    float(o["score"]), rel=1e-9
                )


class TestHasParentAndParentId:
    def test_has_parent_constant_and_scored(self, eng, corpus):
        pmeta = (
            corpus.groupBy("conv_id")
            .agg(F.count("*").alias("n_turns"))
            .toPandas()
        )
        match = set(pmeta[pmeta.n_turns >= 6].conv_id)
        n_children = int(
            corpus.toPandas().conv_id.isin(match).sum()
        )
        got = eng.search(
            HasParentSpec(parent_filter="n_turns >= 6"), k=n_children + 5
        ).toPandas()
        assert len(got) == n_children
        assert (got.score == 1.0).all()
        scored = eng.search(
            HasParentSpec(
                parent_filter="n_turns >= 6", score_expr="n_turns * 0.5"
            ),
            k=5,
        ).toPandas()
        exp_top = sorted(pmeta[pmeta.n_turns >= 6].n_turns * 0.5,
                         reverse=True)[0]
        assert scored.score.iloc[0] == pytest.approx(exp_top)

    def test_parent_id(self, eng, corpus):
        conv = corpus.select("conv_id").first()["conv_id"]
        n = corpus.filter(F.col("conv_id") == conv).count()
        got = eng.search(
            spec_from_json({"parent_id": {"type": "turn", "id": conv}}),
            k=n + 5,
        ).toPandas()
        assert len(got) == n
        assert (got.score == 1.0).all()
        exp_ids = sorted(
            r["doc_id"]
            for r in corpus.filter(F.col("conv_id") == conv)
            .select("doc_id").collect()
        )
        assert sorted(got.doc_id) == exp_ids

    def test_explain_route_covers_every_spec_family(self, eng):
        # regression: explain_route must ANSWER for every dispatchable
        # spec type (it crashed on span/join/pinned specs before)
        for body, route in (
            ({"span_near": {"clauses": [
                {"span_term": {"value": "a"}},
                {"span_term": {"value": "b"}}], "slop": 1}}, "corpus"),
            ({"intervals": {"text": {"match": {"query": "a b"}}}},
             "corpus"),
            ({"has_child": {"query": {"match": {"query_text": "x"}}}},
             "composite"),
            ({"has_parent": {"filter": "n_turns > 3"}}, "corpus"),
            ({"parent_id": {"id": "c1"}}, "corpus"),
            ({"pinned": {"ids": [1],
                         "organic": {"match": {"query_text": "x"}}}},
             "composite"),
        ):
            r = eng.explain_route(body)
            assert r["route"] == route, (body, r)

    def test_parent_id_composes_in_function_score(self, eng, corpus):
        # _full_scored path: wrap parent_id in function_score weight 3
        spec = spec_from_json(
            {"function_score": {
                "query": {"parent_id": {"id":
                    corpus.select("conv_id").first()["conv_id"]}},
                "functions": [{"weight": 3.0}],
                "boost_mode": "replace",
            }}
        )
        got = eng.search(spec, k=3).toPandas()
        assert len(got) > 0
        assert (got.score == 3.0).all()
